package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs under the total
  * order "score DESC, id ASC", kept sorted best-first. Insertion is a
  * constant-time reject against the current worst once the buffer is
  * full — on a corpus-scale candidate stream, almost every row takes
  * that branch — plus an O(k) shift for the rare accepted row (k is a
  * result-page size: 5..100).
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** a-before-b under (score desc, id asc). */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !before(s, id, scores(n - 1), ids(n - 1))) return
    // find insertion point (first slot the new pair goes before)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, id, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val last = math.min(n, k - 1)
    var j = last
    while (j > lo) {
      scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1
    }
    scores(lo) = s
    ids(lo) = id
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Native bounded top-k aggregate for similarity search: per group,
  * the `k` best (score, id) pairs by "score DESC, id ASC" — the same
  * total order as `row_number() OVER (ORDER BY cosine DESC, id ASC)
  * <= k`, so results are identical to the window form.
  *
  * Why: the window form shuffles and SORTS every candidate pair per
  * query — at corpus scale the losers dominate the shuffle. As a
  * TypedImperativeAggregate this runs partial map-side: each task
  * combines its candidates into a k-slot buffer, so the shuffle
  * carries at most k pairs per (query, task) and nothing is ever
  * globally sorted. Null score or id rows are skipped (a null cosine
  * means a corrupt vector — it cannot rank).
  *
  * Output: `array<struct<cosine double, id bigint>>` ordered
  * best-first; explode positionally for (neighbor, rank) rows.
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) if k >= 1 && k <= TopKPairs.MaxK =>
        TypeCheckResult.TypeCheckSuccess
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs k must be in [1, ${TopKPairs.MaxK}], got $k")
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs requires (DOUBLE score, BIGINT id), got " +
          s"${s.catalogString} and ${i.catalogString}")
    }

  override def dataType: DataType = ArrayType(TopKPairs.entryType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val out = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      out(i) = InternalRow(buffer.scores(i), buffer.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.n * 16)
    bb.putInt(buffer.k).putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      // already sorted: append directly
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong()
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {

  /** Page-size guard: far above any real k, far below buffer-abuse. */
  val MaxK = 100000

  val entryType: StructType = StructType(Seq(
    StructField("cosine", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** `Column` surface: an aggregate usable directly in `.agg(...)`. */
  def column(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TopKPairs(
        org.apache.spark.sql.graft.ColumnBridge.expression(score),
        org.apache.spark.sql.graft.ColumnBridge.expression(id),
        k).toAggregateExpression())
}
