package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the hashed bag-of-ngrams FEATURE
  * BUCKETS of a document in one pass — the featurizer behind the
  * whole DSIR / LM-fluency / Naive-Bayes scoring family
  * ([[graft.operators.Sampling.dsirState]] and friends).
  * Bit-identical to the column-algebra form it replaces:
  *
  *   tokens   = non-empty splits of
  *              trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
  *   feats    = tokens ++ [tokens(i) + " " + tokens(i+1)]   (in order)
  *   bucket_f = md5Hash60(salt + ":" + f) % buckets         (Int)
  *
  * i.e. `conv(substring(md5(concat_ws(":", salt, f)), 1, 15), 16, 10)
  * % buckets` — the exact algebra every external oracle replays
  * (x97's CTE chain, x152–x154's train replay).
  *
  * Why an Expression: the column form nests THREE interpreted
  * higher-order functions per document (transform over a sequence for
  * bigrams, slice + concat_ws per element, then transform over the
  * concatenated features for the md5), each hash paying a hex render
  * + substring + base-16 conv. Measured at sf0.1 (NbAB): 4.0 s for
  * the interpreted chain vs 0.46 s for a flat explode+md5 — and this
  * is the map stage of every corpus-wide quality/langid/importance
  * scan, so it must stay inside whole-stage codegen. Here each
  * feature is one MessageDigest call over reused buffers and the
  * bucket is read straight off the digest bytes.
  *
  * Output `array<int>` WITH duplicates, unigrams first then bigrams
  * in document order (count semantics — the states count feature
  * OCCURRENCES; dedup would change the models). Zero tokens AND null
  * text both yield an empty array (exactly the column form — its
  * coalesce swallows the null mid-chain; `explode` drops the row
  * either way).
  */
case class NgramBuckets(child: Expression, buckets: Int, salt: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if buckets >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"ngram_buckets requires buckets >= 1, got $buckets")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_buckets requires a STRING argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    NgramBuckets.compute(input.asInstanceOf[UTF8String], buckets, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramBuckets.compute($c, $buckets, $saltRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramBuckets =
    copy(child = newChild)
}

object NgramBuckets {

  /** `Column` surface (no session registration needed). Null text
    * coalesces to an EMPTY array at the column level — the reference
    * algebra's behavior (its `coalesce(toks, array())` swallows the
    * null mid-chain), so native == reference on every input; the
    * expression itself stays nullIntolerant. */
  def column(c: Column, buckets: Int, salt: String): Column =
    org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        NgramBuckets(org.apache.spark.sql.graft.ColumnBridge.expression(c),
          buckets, salt)),
      org.apache.spark.sql.functions.typedlit(Array.empty[Int]))

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** The primitive pipeline — shared by interpreted eval and codegen. */
  def compute(text: UTF8String, buckets: Int, salt: String): ArrayData = {
    // Spark's lower(): ASCII fast path, full String.toLowerCase beyond
    val str = text.toLowerCase.toString
    val len = str.length
    // token spans over the lowercased string (starts/ends, paired)
    var spans = new Array[Int](32)
    var m = 0
    var i = 0
    while (i < len) {
      if (isAlnum(str.charAt(i))) {
        var j = i
        while (j < len && isAlnum(str.charAt(j))) j += 1
        if (2 * m == spans.length)
          spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(2 * m) = i; spans(2 * m + 1) = j
        m += 1
        i = j
      } else i += 1
    }
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val md = ShingleHashes.mdTl.get()
    val prefix = (salt + ":").getBytes(StandardCharsets.UTF_8)
    // tokens are [a-z0-9] runs — single-byte UTF-8 by construction;
    // size the feature buffer once: prefix + two longest tokens + ' '
    var maxTok = 0
    var s = 0
    while (s < m) {
      val l = spans(2 * s + 1) - spans(2 * s)
      if (l > maxTok) maxTok = l
      s += 1
    }
    val buf = new Array[Byte](prefix.length + 2 * maxTok + 1)
    java.lang.System.arraycopy(prefix, 0, buf, 0, prefix.length)
    def copyTok(t: Int, at: Int): Int = {
      val ts = spans(2 * t); val te = spans(2 * t + 1)
      var k = ts
      var o = at
      while (k < te) { buf(o) = str.charAt(k).toByte; k += 1; o += 1 }
      o
    }
    val out = new Array[Int](2 * m - 1)
    var t = 0
    while (t < m) { // unigrams, in order
      val end = copyTok(t, prefix.length)
      out(t) = (ShingleHashes.md5Hash60(md, buf, end) % buckets).toInt
      t += 1
    }
    t = 0
    while (t < m - 1) { // bigrams "tok_i tok_i+1", in order
      var end = copyTok(t, prefix.length)
      buf(end) = ' '.toByte
      end = copyTok(t + 1, end + 1)
      out(m + t) = (ShingleHashes.md5Hash60(md, buf, end) % buckets).toInt
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
