package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string,
  * `h = (h * 31 + codepoint) mod (1e9+7)` folded left-to-right over
  * code points; empty string hashes to 0.
  *
  * Equivalent column algebra (`aggregate(split(s, ""), ...)`) is
  * interpreted AND materializes a one-char-string array per row; this
  * expression walks the UTF8String bytes in place inside whole-stage
  * codegen. The mod-p arithmetic is overflow-free (identical under
  * ANSI/legacy) and replayable by any engine with a `unicode()`-style
  * codepoint function — see the x12 oracle.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod = 1000000007L

  /** ASCII fast path reads bytes in place; any multi-byte content
    * falls back to a code-point walk (matching `ascii()` per-char
    * semantics and DuckDB `unicode()`). */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    var ascii = true
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b >= 0x80) { ascii = false; i = n }
      else { h = (h * 31L + b) % Mod; i += 1 }
    }
    if (ascii) h
    else {
      h = 0L
      val str = s.toString
      var k = 0
      while (k < str.length) {
        val cp = str.codePointAt(k)
        h = (h * 31L + cp) % Mod
        k += java.lang.Character.charCount(cp)
      }
      h
    }
  }
}
