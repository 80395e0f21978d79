package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization of an embedding
  * (`array<float>` → `struct<scale double, q array<tinyint>>`), plus
  * the integer dot product over quantized vectors — the 4× memory /
  * bandwidth lever for ANN indexes at corpus scale (a 100 TB float32
  * embedding column becomes 25 TB, and candidate scoring reads a
  * quarter of the bytes).
  *
  * Quantization is DETERMINISTIC, engine-replayable algebra (the house
  * rule — approximation may live in recall, never reproducibility):
  *   scale = max_d |x_d| / 127  (double arithmetic)
  *   q_d   = clamp(floor(x_d / scale + 0.5), -127, 127)  (half-up)
  * An all-zero vector gets scale 0 and q = 0. The approximate dot of
  * two quantized vectors is `scale_a * scale_b * Σ q_a·q_b`, with the
  * integer Σ exact in int64 (|q| ≤ 127 ⇒ |term| ≤ 16129; 2^63/16129 ≈
  * 5.7e14 dimensions of headroom). Each |approx−exact| error term is
  * bounded by the two half-unit rounding errors, so approximate cosine
  * lands within ~2·√dim/127 of exact — rerank the top candidates with
  * full-precision [[FloatDot]] when that matters.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = Int8Vec.quantType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(input: Any): Any =
    Int8Vec.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Int8Vec.quantize($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Exact int64 dot product of two `array<tinyint>` quantized vectors;
  * NULL on length mismatch or null elements (the [[FloatDot]]
  * contract). */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_dot requires two ARRAY<TINYINT> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8Vec.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_d = graft.functions.Int8Vec.dotOrNull($a, $b);
      if (${ev.value}_d == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_d.longValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Vec {

  val quantType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  /** `Column` surfaces. */
  def quantizeCol(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Int8Quantize(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  def dotCol(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Int8Dot(org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** The primitive loops — shared by interpreted eval and codegen.
    * NOTE: the return type must be the EXACT Java type of the
    * generated assignment target (`InternalRow`, not `Any`/`Object`) —
    * janino rejects an Object-to-InternalRow assignment and the whole
    * stage silently falls back to interpreted execution. */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val v = math.floor(arr.getFloat(i).toDouble / scale + 0.5)
        q(i) = math.max(-127.0, math.min(127.0, v)).toByte
        i += 1
      }
    }
    InternalRow(scale, UnsafeArrayData.fromPrimitiveArray(q))
  }

  def dotOrNull(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
