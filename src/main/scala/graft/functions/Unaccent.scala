package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: strip diacritics (NFD-decompose, drop
  * combining marks). The reference normalizes French column headers
  * this way (`normalize_column_name`,
  * /root/reference/src/preprocess_to_staging.py:13-32); Spark ≤4 has
  * no built-in unaccent, and a Scala UDF would box every row and block
  * whole-stage codegen — this expression stays inside codegen via
  * `defineCodeGen` (one static Java call, no Row boxing).
  */
case class Unaccent(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unaccent requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unaccent"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Unaccent.strip(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Unaccent.strip($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}

object Unaccent {
  /** NFD-decompose then drop all combining marks ("é" -> "e"). */
  def strip(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
}
