package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: all unordered pairs of a bucket's
  * member ids, normalized to `id_a < id_b` — the in-row form of LSH
  * candidate generation.
  *
  * `explode(sorted_pairs(collect_list(id)))` replaces the classic
  * band-bucket SELF-JOIN: one hash aggregate instead of aggregate +
  * size-cap join + shuffled self-join, and the quadratic pair fan-out
  * happens inside a row whose size the caller has already capped
  * (`size(ids) <= maxBucketSize`), so memory is bounded by cap². The
  * pair SET is independent of the collect_list order (normalization
  * by min/max), which keeps candidate generation deterministic under
  * any partitioning. Null elements are skipped; duplicate ids yield
  * no self-pair.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs requires an ARRAY<BIGINT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(SortedPairs.pairType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_pairs"

  override protected def nullSafeEval(input: Any): Any =
    SortedPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SortedPairs.pairs($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {

  val pairType: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))

  /** `Column` surface. */
  def column(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedPairs(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** The primitive loop — shared by interpreted eval and codegen. */
  def pairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { ids(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    val out = new Array[Any](m * (m - 1) / 2 max 0)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val a = ids(i); val b = ids(j)
        if (a != b) {
          out(k) = InternalRow(math.min(a, b), math.max(a, b))
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == out.length) out else out.take(k))
  }
}
