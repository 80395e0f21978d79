package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the number of positions where two
  * `array<bigint>` columns carry the same value — the MinHash
  * signature-agreement count, whose ratio over k is the unbiased
  * Jaccard estimate. One primitive loop per candidate pair inside
  * whole-stage codegen (the HOF form `size(filter(zip_with(...)))`
  * is interpreted). NULL on a null array, length mismatch, or null
  * element (the [[FloatDot]] contract).
  */
case class SlotMatches(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"slot_matches requires two ARRAY<BIGINT> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "slot_matches"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SlotMatches.countOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Integer ${ev.value}_m =
        graft.functions.SlotMatches.countOrNull($a, $b);
      if (${ev.value}_m == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_m.intValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlotMatches =
    copy(left = newLeft, right = newRight)
}

object SlotMatches {

  /** `Column` surface. */
  def column(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SlotMatches(org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** The primitive loop — shared by interpreted eval and codegen. */
  def countOrNull(x: ArrayData, y: ArrayData): java.lang.Integer = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }
}
