package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT word-n-gram shingle-hash
  * set of a document in one pass — tokenize, hash each token, hash
  * each shingle of n consecutive token hashes, dedup. Bit-identical to
  * the column-algebra pipeline it replaces
  * ([[graft.operators.Dedup.shingleHashArrays]]):
  *
  *   tokens   = non-empty splits of
  *              trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
  *   th[i]    = md5Hash60(token_i)          (PortableHash md5-60)
  *   shingle  = md5Hash60(th[i] || "," || ... || th[i+n-1])
  *              (decimal renderings, comma-joined)
  *   short doc (0 < |th| < n): ONE shingle over th padded with
  *              sentinel slots -1, -2, ... -(n-1)
  *   n == 1:  the distinct token hashes themselves
  *
  * and therefore to the external DuckDB oracle replay (same md5, same
  * decimal concatenation).
  *
  * Why an Expression: the column form runs TWO interpreted
  * higher-order functions per document (transform over tokens, then
  * transform over shingle indices), each md5 going through a
  * hex-string render + substring + base-16 conv — boxed lambda frames
  * and five string allocations per hash. This is the map stage of
  * MinHash dedup / n-gram contamination — the single hottest scan at
  * corpus scale — so it must stay inside whole-stage codegen: here
  * each hash is one MessageDigest call over reused buffers and the
  * 60-bit value is read straight off the digest bytes.
  *
  * Output `array<long>` in first-occurrence order (the `array_distinct`
  * order); zero tokens yield an EMPTY array (callers filter on size,
  * matching the `where(size(th) > 0)` gate of the column form).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 && n <= ShingleHashes.MaxN =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes n must be in [1, ${ShingleHashes.MaxN}], got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a STRING argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Sanity bound on the shingle width. */
  val MaxN = 64

  /** `Column` surface (no session registration needed). */
  def column(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  private[functions] val mdTl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** md5-60 of raw bytes: the top 60 bits (15 hex chars) of the md5
    * digest — exactly `conv(substring(md5(s),1,15),16,10)`. */
  private[functions] def md5Hash60(md: MessageDigest, bytes: Array[Byte], len: Int): Long = {
    md.reset()
    md.update(bytes, 0, len)
    val d = md.digest()
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xFFL); i += 1 }
    top >>> 4
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** The md5-60 hash of every normalized token in document order
    * (lowercase, maximal `[a-z0-9]` runs — the canonical tokenizer
    * shared by every text operator). Returns the backing array, which
    * may be longer than the token count: read `m` entries. */
  private[functions] def tokenHashes(md: MessageDigest, str: String): (Array[Long], Int) = {
    var th = new Array[Long](16)
    var m = 0
    var buf = new Array[Byte](64)
    val len = str.length
    var i = 0
    while (i < len) {
      if (isAlnum(str.charAt(i))) {
        var j = i
        while (j < len && isAlnum(str.charAt(j))) j += 1
        val tlen = j - i
        if (tlen > buf.length) buf = new Array[Byte](tlen)
        var k = 0
        while (k < tlen) { buf(k) = str.charAt(i + k).toByte; k += 1 }
        if (m == th.length) th = java.util.Arrays.copyOf(th, m * 2)
        th(m) = md5Hash60(md, buf, tlen)
        m += 1
        i = j
      } else i += 1
    }
    (th, m)
  }

  /** The primitive pipeline — shared by interpreted eval and codegen. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // Spark's lower(): ASCII fast path, full String.toLowerCase beyond
    val str = text.toLowerCase.toString
    val md = mdTl.get()
    val (th, m) = tokenHashes(md, str)
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // distinct, first-occurrence order (= array_distinct)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n <= 1) {
      var t = 0
      while (t < m) { seen.add(th(t)); t += 1 }
    } else {
      val sb = new java.lang.StringBuilder(n * 21)
      def shingleAt(render: Int => Long): Long = {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(',')
          sb.append(render(j))
          j += 1
        }
        val bytes = sb.toString.getBytes(StandardCharsets.US_ASCII)
        md5Hash60(md, bytes, bytes.length)
      }
      if (m >= n) {
        var s = 0
        while (s <= m - n) {
          val start = s
          seen.add(shingleAt(j => th(start + j)))
          s += 1
        }
      } else {
        // one padded shingle: th[j] where present, sentinel -j beyond
        seen.add(shingleAt(j => if (j < m) th(j) else -j.toLong))
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
