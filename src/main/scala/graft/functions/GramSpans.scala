package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the word-n-gram hash at EVERY start
  * position of a document, in order, duplicates preserved — the
  * positioned sibling of [[ShingleHashes]] (which returns the
  * DISTINCT set). Element `i` of the output is the hash of tokens
  * `i..i+n-1` under the canonical tokenizer/hash chain:
  *
  *   tokens = non-empty splits of
  *            trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
  *   th[i]  = md5Hash60(token_i)
  *   out[i] = md5Hash60(th[i] || "," || ... || th[i+n-1])
  *            (decimal renderings, comma-joined)
  *
  * Unlike [[ShingleHashes]] there is NO short-document padding: a
  * document with fewer than n tokens has no n-token span that could
  * repeat elsewhere, so it yields an EMPTY array (whole-short-doc
  * duplication is the doc-level tier's job, x01). `n == 1` returns
  * the token hashes themselves, positioned.
  *
  * This is the fan-out scan of exact-substring span dedup (the
  * Lee et al. 2021 suffix-array method re-expressed as gram
  * counting) — corpus-hottest, so it must stay one codegen'd pass:
  * one MessageDigest call per hash over reused buffers, no token-row
  * explosion, no interpreted HOF frames.
  */
case class PositionedGramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 && n <= ShingleHashes.MaxN =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes n must be in [1, ${ShingleHashes.MaxN}], got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a STRING argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    PositionedGramHashes.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PositionedGramHashes.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PositionedGramHashes =
    copy(child = newChild)
}

object PositionedGramHashes {

  /** `Column` surface (no session registration needed). */
  def column(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PositionedGramHashes(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  def grams(text: UTF8String, n: Int): ArrayData = {
    val str = text.toLowerCase.toString
    val md = ShingleHashes.mdTl.get()
    val (th, m) = ShingleHashes.tokenHashes(md, str)
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    if (n == 1) return UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(th, m))
    val out = new Array[Long](m - n + 1)
    val sb = new java.lang.StringBuilder(n * 21)
    var s = 0
    while (s <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(',')
        sb.append(th(s + j))
        j += 1
      }
      val bytes = sb.toString.getBytes(StandardCharsets.US_ASCII)
      out(s) = ShingleHashes.md5Hash60(md, bytes, bytes.length)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst expression: drop the elements of a string array
  * whose 0-based index appears in a SORTED long array — the rewrite
  * step of span dedup (`prune_indices(tokens, removed_idx)`), kept
  * codegen'd because it runs once per surviving document.
  *
  * A lambda form (`filter(toks, (t, i) -> !array_contains(rm, i))`)
  * would run interpreted AND cost O(|toks|·|rm|) per document; this
  * is one merge walk, O(|toks| + |rm|). Drop indexes outside
  * `[0, |arr|)` are ignored; both inputs null-intolerant.
  */
case class PruneIndices(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "prune_indices requires (array<string>, array<bigint>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "prune_indices"

  override protected def nullSafeEval(arr: Any, drop: Any): Any =
    PruneIndices.prune(arr.asInstanceOf[ArrayData], drop.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, d) => s"graft.functions.PruneIndices.prune($a, $d)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PruneIndices = copy(left = newLeft, right = newRight)
}

object PruneIndices {

  /** `Column` surface (no session registration needed). */
  def column(arr: Column, drop: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PruneIndices(org.apache.spark.sql.graft.ColumnBridge.expression(arr),
        org.apache.spark.sql.graft.ColumnBridge.expression(drop)))

  def prune(arr: ArrayData, drop: ArrayData): ArrayData = {
    val n = arr.numElements()
    val d = drop.numElements()
    if (d == 0) return arr
    val kept = new Array[AnyRef](n)
    var k = 0
    var di = 0
    var i = 0
    while (i < n) {
      // advance past drop entries below i (sorted input contract;
      // null entries cannot arrive from the span pipeline — skipped)
      while (di < d && (drop.isNullAt(di) || drop.getLong(di) < i)) di += 1
      if (di < d && drop.getLong(di) == i) di += 1
      else {
        kept(k) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, k))
  }
}
