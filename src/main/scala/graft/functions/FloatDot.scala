package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>`
  * columns, accumulated in double, summed left-to-right (index order —
  * the same fold order as the `aggregate`/`zip_with` column-algebra
  * form, so results are bit-identical to it and to an external
  * oracle's list_sum).
  *
  * Why an Expression and not HOFs: Spark evaluates higher-order
  * functions interpreted (CodegenFallback), boxing every element and
  * lambda frame. The embedding operators evaluate a dot per candidate
  * PAIR — the single hottest scalar in the similarity path at scale —
  * so this stays in whole-stage codegen as one tight primitive loop
  * over the unsafe array data (no boxing, no per-element virtual
  * calls).
  *
  * Both inputs must be non-null-element float arrays (embedding
  * columns are). A LENGTH MISMATCH yields NULL — the same contract as
  * the zip_with form (which pads the shorter side with null and
  * poisons the sum), so ragged/corrupt vectors drop out of
  * `>= threshold` filters instead of contributing a partial dot that
  * looks like a plausible similarity.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two ARRAY<FLOAT> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else FloatDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.FloatDot.dot($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** The primitive loop — shared by interpreted eval and codegen. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }
}
