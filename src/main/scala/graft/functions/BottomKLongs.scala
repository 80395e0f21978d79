package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k DISTINCT buffer over Longs, kept sorted
  * ascending: the per-group KMV sketch state. Insertion is a
  * constant-time reject against the current max once full (the branch
  * almost every row of a corpus-scale stream takes), a binary search
  * that drops duplicates exactly (a KMV holds distinct hashes), and an
  * O(k) shift for the rare accepted value (k is sketch-sized:
  * 64..1024). */
final class BottomKBuffer(val k: Int) {
  var n: Int = 0
  val vs: Array[Long] = new Array[Long](k)

  def insert(v: Long): Unit = {
    if (n == k && v >= vs(n - 1)) {
      return // not smaller than the kept max (equal ⇒ duplicate)
    }
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v == vs(mid)) return // already held
      else if (v < vs(mid)) hi = mid
      else lo = mid + 1
    }
    var j = math.min(n, k - 1)
    while (j > lo) { vs(j) = vs(j - 1); j -= 1 }
    vs(lo) = v
    if (n < k) n += 1
  }

  def mergeFrom(o: BottomKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.vs(i)); i += 1 }
  }
}

/** Native per-group bottom-k-distinct aggregate — the grouped KMV
  * build ([[graft.operators.Kmv.groupedBuild]]): each group's k
  * smallest distinct hash values in ONE hash aggregate, partial
  * map-side, so the shuffle carries at most k Longs per (group, task)
  * and nothing is ever globally sorted. The window alternative
  * (`row_number() OVER (PARTITION BY g ORDER BY hv) <= k`) sorts every
  * group's full key stream — the exact shuffle this buffer exists to
  * avoid. Null inputs are skipped. Output: `array<bigint>` ascending.
  */
case class BottomKLongs(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType if k >= 1 && k <= BottomKLongs.MaxK =>
        TypeCheckResult.TypeCheckSuccess
      case LongType => TypeCheckResult.TypeCheckFailure(
        s"bottom_k_longs k must be in [1, ${BottomKLongs.MaxK}], got $k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"bottom_k_longs requires a BIGINT input, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_longs"

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buffer: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKBuffer, input: BottomKBuffer): BottomKBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: BottomKBuffer): Any = {
    val out = new Array[Long](buffer.n)
    System.arraycopy(buffer.vs, 0, out, 0, buffer.n)
    new GenericArrayData(out)
  }

  override def serialize(buffer: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.n * 8)
    bb.putInt(buffer.k).putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BottomKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.vs(i) = bb.getLong(); i += 1 } // already sorted
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongs =
    copy(child = newChildren(0))
}

object BottomKLongs {

  /** Sketch-size guard: far above any real k, far below buffer-abuse. */
  val MaxK = 100000

  /** `Column` surface: an aggregate usable directly in `.agg(...)`. */
  def column(value: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BottomKLongs(
        org.apache.spark.sql.graft.ColumnBridge.expression(value),
        k).toAggregateExpression())
}
