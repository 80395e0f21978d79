package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: byte-level integrity statistics of a
  * binary payload in ONE pass —
  * `struct<n_bytes int, distinct_bytes int, max_freq int, checksum bigint>`.
  *
  * The no-codec corruption screen for multimodal lakes: a truncated
  * download shows up as an n_bytes/declared-dimensions mismatch,
  * zero-filled or constant filler as `distinct_bytes` near 1 /
  * `max_freq` near n, and any byte-level change flips the
  * position-weighted checksum `Σ (b_i+1)·(i+1)` (exact int64 for
  * payloads to ~250 MB; engine-portable integer algebra, so an
  * external oracle replays it bit-for-bit). A 256-slot histogram per
  * row is trivial in a primitive loop and impossible to express
  * efficiently in column algebra — exactly the Expression sweet spot.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_stats requires a BINARY argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ByteStats.statsType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_stats"

  override protected def nullSafeEval(input: Any): Any =
    ByteStats.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ByteStats.stats($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

object ByteStats {

  val statsType: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("distinct_bytes", IntegerType, nullable = false),
    StructField("max_freq", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** `Column` surface. */
  def column(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ByteStats(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** The primitive loop — shared by interpreted eval and codegen. */
  def stats(bytes: Array[Byte]): InternalRow = {
    val hist = new Array[Int](256)
    var checksum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      hist(b) += 1
      checksum += (b + 1).toLong * (i + 1).toLong
      i += 1
    }
    var distinct = 0
    var maxFreq = 0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        distinct += 1
        if (hist(j) > maxFreq) maxFreq = hist(j)
      }
      j += 1
    }
    InternalRow(bytes.length, distinct, maxFreq, checksum)
  }
}
