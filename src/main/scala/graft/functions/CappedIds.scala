package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Collection buffer that stops at `limit + 1` elements: enough to
  * PROVE a group exceeds `limit`, never more. Once full, every further
  * insert is a no-op — so a degenerate group (an LSH bucket of
  * boilerplate near-identical docs can hold millions of members) costs
  * O(limit) buffer memory instead of materializing every member id.
  *
  * Storage GROWS geometrically from 8 slots instead of pre-allocating
  * `limit + 1`: with the default cap of 1000 an eager buffer is 8 KB
  * per GROUP, and LSH banding makes one group per (band, bucket) —
  * measured at sf0.1 (~80k groups/run) the eager form cost a steady
  * ~25% on the pair-generation stage in pure allocation. Typical
  * buckets hold a handful of ids; only the rare near-cap bucket ever
  * grows to the full 8 KB. */
final class CappedIdsBuffer(val limit: Int) {
  val cap: Int = limit + 1
  var n: Int = 0
  var ids: Array[Long] = new Array[Long](math.min(cap, 8))

  private def ensure(want: Int): Unit = {
    if (want > ids.length) {
      var next = ids.length << 1
      while (next < want) next <<= 1
      val grown = new Array[Long](math.min(next, cap))
      System.arraycopy(ids, 0, grown, 0, n)
      ids = grown
    }
  }

  def insert(id: Long): Unit = {
    if (n < cap) { ensure(n + 1); ids(n) = id; n += 1 }
  }

  def mergeFrom(o: CappedIdsBuffer): Unit = {
    val take = math.min(o.n, cap - n)
    if (take > 0) {
      ensure(n + take)
      System.arraycopy(o.ids, 0, ids, n, take)
      n += take
    }
  }
}

/** Size-bounded `collect_list` for group-member ids: collects at most
  * `limit + 1` elements per group. Callers that drop over-limit groups
  * (`size(ids) <= limit` — the LSH degenerate-bucket cap) get
  * IDENTICAL results to an uncapped collect + size filter: a group
  * within the limit is collected in full, and a group over it yields
  * `limit + 1` elements — still > limit, still dropped — without the
  * aggregation buffer ever holding the full membership. This is the
  * difference between "the cap bounds downstream pair fan-out" and
  * "the cap also bounds aggregation memory": with plain collect_list a
  * single boilerplate bucket at corpus scale is one giant buffer row.
  *
  * Element ORDER is partition-dependent (like collect_list) — callers
  * must be order-insensitive (e.g. [[SortedPairs]] normalizes pairs).
  * Null ids are skipped. Output: `array<bigint>`.
  */
case class CappedIds(idExpr: Expression, limit: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdsBuffer] {

  override def children: Seq[Expression] = Seq(idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    idExpr.dataType match {
      case LongType if limit >= 1 && limit <= CappedIds.MaxLimit =>
        TypeCheckResult.TypeCheckSuccess
      case LongType => TypeCheckResult.TypeCheckFailure(
        s"capped_ids limit must be in [1, ${CappedIds.MaxLimit}], got $limit")
      case other => TypeCheckResult.TypeCheckFailure(
        s"capped_ids requires a BIGINT id, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_ids"

  override def createAggregationBuffer(): CappedIdsBuffer = new CappedIdsBuffer(limit)

  override def update(buffer: CappedIdsBuffer, input: InternalRow): CappedIdsBuffer = {
    val id = idExpr.eval(input)
    if (id != null) buffer.insert(id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CappedIdsBuffer, input: CappedIdsBuffer): CappedIdsBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: CappedIdsBuffer): Any = {
    val out = new Array[Long](buffer.n)
    System.arraycopy(buffer.ids, 0, out, 0, buffer.n)
    new GenericArrayData(out)
  }

  override def serialize(buffer: CappedIdsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.n * 8)
    bb.putInt(buffer.limit).putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedIdsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedIdsBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedIds =
    copy(idExpr = newChildren(0))
}

object CappedIds {

  /** Sanity guard: a bucket cap far above this is "no cap at all". */
  val MaxLimit = 10000000

  /** `Column` surface: an aggregate usable directly in `.agg(...)`. */
  def column(id: Column, limit: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CappedIds(
        org.apache.spark.sql.graft.ColumnBridge.expression(id),
        limit).toAggregateExpression())
}
