package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric vector
  * columns (`array<float>` or `array<double>`, independently per
  * side), accumulated in double, summed left-to-right (index order —
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
  * calls). The element width (float vs double) is resolved at plan
  * time, so the generated loop is still monomorphic.
  *
  * Null contract (matches the zip_with form): a NULL array, a LENGTH
  * MISMATCH, or any NULL ELEMENT yields NULL — ragged/corrupt/
  * null-poisoned vectors drop out of `>= threshold` filters instead of
  * contributing a partial dot that looks like a plausible similarity.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  private def vecElem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vecElem(left.dataType), vecElem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    FloatDot.dotOrNull(x, y, isDouble(left), isDouble(right))
  }

  // NOTE: generated lines must never START with '|' — the codegen
  // Block interpolator strip-margins the template, so a line-leading
  // "||" is eaten and janino fails (whole-stage falls back to
  // interpreted, silently). Keep the operator at end-of-line.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ld, rd) = (isDouble(left), isDouble(right))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements() ||
          graft.functions.FloatDot.anyNullElement($a, $b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.FloatDot.dot($a, $b, $ld, $rd);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {

  /** True if either array has a null slot. Embedding columns read from
    * parquet are declared element-nullable even when no element ever
    * is, so this cannot be ruled out at plan time — but on
    * UnsafeArrayData it is a cheap bitmap probe per element, and the
    * branch never mispredicts on clean data. */
  def anyNullElement(x: ArrayData, y: ArrayData): Boolean = {
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** The primitive loop — shared by interpreted eval and codegen. The
    * width flags are plan-time constants at every call site, so the
    * JIT sees a monomorphic accessor per loop. */
  def dot(x: ArrayData, y: ArrayData, xd: Boolean, yd: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val a = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val b = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      s += a * b
      i += 1
    }
    s
  }

  private[functions] def dotOrNull(
      x: ArrayData, y: ArrayData, xd: Boolean, yd: Boolean): Any =
    if (x.numElements() != y.numElements() || anyNullElement(x, y)) null
    else dot(x, y, xd, yd)
}
