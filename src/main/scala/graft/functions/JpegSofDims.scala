package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: JPEG dimensions via the SOF MARKER
  * WALK — no entropy decoding (that stays the documented codec stub;
  * dimensions never needed it). A JPEG is `FFD8` followed by marker
  * segments `FF mm len_hi len_lo payload…`; the frame header SOFn
  * (0xC0–0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC) carries height
  * then width as big-endian u16 at payload offsets 1 and 3. The walk
  * hops segment lengths until it lands on a SOF — data-dependent
  * offsets, so column algebra cannot express it without exponential
  * expression blow-up; a byte-array walk inside whole-stage codegen is
  * the natural shape (the [[PolyHash]] rule).
  *
  * Output: `(height << 16) | width` packed in one long, or NULL for
  * non-JPEG bytes, truncated streams, fill-byte runs that exhaust the
  * payload, or a scan section reached before any SOF. JPEG dims are
  * u16 so the packing is exact; unpack with shiftright/and (see
  * [[graft.operators.Multimodal.imageDims]]).
  *
  * Reference scope anchor: the reference treats media blobs as opaque
  * passthrough (SURVEY §2 O10); this is north-star surface — the
  * metadata gate (min-resolution, aspect-ratio) a crawl pipeline
  * needs, where JPEG is the majority format.
  */
case class JpegSofDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_sof_dims requires a BINARY argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jpeg_sof_dims"

  override protected def nullSafeEval(input: Any): Any =
    JpegSofDims.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("jpegDims")
      s"""
        java.lang.Long $r = graft.functions.JpegSofDims.dims($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JpegSofDims =
    copy(child = newChild)
}

object JpegSofDims {

  /** `(height << 16) | width` from the first SOF segment, or null.
    * Defensive on every hop: a malformed length, a marker past the
    * buffer, or a scan/EOI section before SOF reads null — a crawl's
    * byte soup must never throw. */
  def dims(b: Array[Byte]): java.lang.Long = {
    val n = b.length
    if (n < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    var p = 2
    var guard = 0
    while (p + 1 < n && guard < 4096) {
      guard += 1
      if ((b(p) & 0xFF) != 0xFF) return null // not at a marker: corrupt
      var q = p + 1
      while (q < n && (b(q) & 0xFF) == 0xFF) q += 1 // legal fill bytes
      if (q >= n) return null
      val m = b(q) & 0xFF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p = q + 1 // standalone
      else if (m == 0xD9 || m == 0xDA) return null // EOI/SOS before SOF
      else {
        if (q + 2 >= n) return null
        val len = ((b(q + 1) & 0xFF) << 8) | (b(q + 2) & 0xFF)
        if (len < 2) return null
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (q + 7 >= n || len < 7) return null
          val h = ((b(q + 4) & 0xFF) << 8) | (b(q + 5) & 0xFF)
          val w = ((b(q + 6) & 0xFF) << 8) | (b(q + 7) & 0xFF)
          return java.lang.Long.valueOf((h.toLong << 16) | w.toLong)
        }
        p = q + 1 + len
      }
    }
    null
  }
}
