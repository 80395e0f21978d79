package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native Catalyst expression: EXIF ORIENTATION via the APP1 → TIFF
  * IFD walk — the rotate/flip flag (1–8) a crawl pipeline must read
  * before any resize/fingerprint step, or portrait images silently
  * train sideways. Companion to [[JpegSofDims]] (same marker-segment
  * walk; no entropy decoding anywhere): hop JPEG segments to an APP1
  * whose payload opens `Exif\0\0`, then parse the embedded TIFF
  * block — byte order `II`/`MM`, magic 42, IFD0 offset — and scan
  * IFD0's 12-byte entries for tag 0x0112 (SHORT, count 1, value
  * inlined in the entry's left-justified value field). Both byte
  * orders are honest parses, not a fixed offset: the tag can sit at
  * any entry index and the walk reads the declared entry count.
  *
  * NULL for non-JPEG bytes, truncated streams, JPEGs with no Exif
  * APP1 (an XMP APP1 is skipped, not misread — its payload fails the
  * `Exif\0\0` check and the walk continues), a malformed TIFF
  * header, an IFD running past the segment, or an orientation value
  * outside 1–8. Data-dependent offsets again rule out column
  * algebra; the byte walk inlines into whole-stage codegen.
  *
  * Reference scope anchor: the reference treats media blobs as
  * opaque passthrough (SURVEY §2 O10); this is north-star surface —
  * public JPEG/Exif/TIFF 6.0 layout, same class as the SOF walk. */
case class ExifOrientation(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_orientation requires a BINARY argument, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "exif_orientation"

  override protected def nullSafeEval(input: Any): Any =
    ExifOrientation.orientation(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("exifOri")
      s"""
        java.lang.Integer $r = graft.functions.ExifOrientation.orientation($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.intValue(); }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): ExifOrientation = copy(child = newChild)
}

object ExifOrientation {

  /** The segment walk + TIFF parse (called from generated code —
    * keep it a static-shaped helper). Null = "no trustworthy
    * orientation", never an exception: a crawl shard is full of
    * truncated and hostile bytes. */
  def orientation(b: Array[Byte]): java.lang.Integer = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      // fill bytes: any number of FFs may pad before a marker id
      var m = b(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
      if (m == 0xD9 || m == 0xDA) return null // EOI / scan data: give up
      if ((m >= 0xD0 && m <= 0xD7) || m == 0x01) { i += 2 } // standalone
      else {
        if (i + 3 >= b.length) return null
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2 || i + 2 + len > b.length) return null
        if (m == 0xE1 && len >= 8 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
          return tiffOrientation(b, i + 10, i + 2 + len)
        // a non-Exif APP1 (XMP) or any other segment: hop past it
        i += 2 + len
      }
    }
    null
  }

  /** Parse the TIFF block in `[t0, end)` and return IFD0's
    * orientation. Offsets inside the block are relative to `t0` (the
    * TIFF 6.0 rule); every hop is bounds-checked against the APP1
    * segment end so a hostile offset cannot read outside it. */
  private def tiffOrientation(b: Array[Byte], t0: Int,
      end: Int): java.lang.Integer = {
    if (t0 + 8 > end) return null
    val little =
      if (b(t0) == 'I' && b(t0 + 1) == 'I') true
      else if (b(t0) == 'M' && b(t0 + 1) == 'M') false
      else return null
    def u16(o: Int): Int =
      if (little) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int): Long =
      if (little)
        (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
          ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
      else
        ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
          ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    if (u16(t0 + 2) != 42) return null
    val off = u32(t0 + 4)
    if (off < 8 || t0 + off + 2 > end) return null
    val ifd = t0 + off.toInt
    val n = u16(ifd)
    if (n > 512 || ifd + 2 + 12 * n > end) return null // hostile count
    var k = 0
    while (k < n) {
      val e = ifd + 2 + 12 * k
      if (u16(e) == 0x0112) {
        // SHORT, count 1, value left-justified in the 4-byte field
        if (u16(e + 2) != 3 || u32(e + 4) != 1L) return null
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) Integer.valueOf(v) else null
      }
      k += 1
    }
    null
  }
}
