package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every per-document scoring statistic
  * the curation filter needs, in ONE pass over the text — token count,
  * summed token length, per-language stopword hits, and (distinct)
  * word-n-gram counts for the repetition ratio. Bit-identical to the
  * column-algebra chain it replaces
  * ([[graft.operators.TextAnalysis]] `tokens`/`stopwordHits`/
  * `repetitionRatio` — reference scoring semantics: SURVEY §2 north-star
  * extensions):
  *
  *   tokens     = maximal [a-z0-9] runs of lower(text)
  *                (exactly the space-splits of `normalizeText`)
  *   hits(L)    = count of tokens ∈ stopwords(L), repeats counted
  *   n_grams    = n_tokens - gramN + 1 when n_tokens >= gramN, else 0
  *   n_distinct = distinct space-joined gram strings among those
  *
  * Why an Expression: the curation filter referenced the materialized
  * token array ~12 times (5 langId hits + 5 quality hits + the
  * repetition transform + size guards). Predicate pushdown substitutes
  * the alias into the filter predicate, so every reference re-ran the
  * tokenizer regex plus an interpreted higher-order lambda — and HOF
  * subtrees are EXCLUDED from codegen subexpression elimination (they
  * carry lambda variables), so nothing deduped: measured ~26 ms/doc at
  * sf0.001 (~10 tokenizations + ~20k boxed lambda frames per doc).
  * This expression has no lambdas, so even when the optimizer inlines
  * it N times the equivalent subtrees collapse to ONE evaluation under
  * whole-stage codegen CSE — and that one evaluation is a single
  * primitive loop.
  *
  * Output: struct<n_tokens int, sum_len bigint, hits array<int>
  * (one per language, input order), n_grams int, n_distinct int>.
  * Null text yields null (callers' `when` guards then behave exactly
  * as with null token arrays).
  */
case class DocStats(child: Expression,
    langWords: Seq[Seq[String]], gramN: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if gramN >= 1 && gramN <= DocStats.MaxN =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"doc_stats gramN must be in [1, ${DocStats.MaxN}], got $gramN")
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_stats requires a STRING argument, got ${other.catalogString}")
  }

  override def dataType: DataType = DocStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_stats"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    DocStats.buildSets(langWords)

  override protected def nullSafeEval(input: Any): Any =
    DocStats.compute(input.asInstanceOf[UTF8String], sets, gramN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("stopSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocStats.compute($c, $setsRef, $gramN)")
  }

  override protected def withNewChildInternal(newChild: Expression): DocStats =
    copy(child = newChild)
}

object DocStats {

  /** Sanity bound on the repetition-gram width. */
  val MaxN = 16

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  /** `Column` surface (no session registration needed). */
  def column(c: Column, langWords: Seq[Seq[String]], gramN: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DocStats(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        langWords, gramN))

  private[functions] def buildSets(
      langWords: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    langWords.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** The primitive pipeline — shared by interpreted eval and codegen. */
  def compute(text: UTF8String,
      sets: Array[java.util.HashSet[String]], gramN: Int): InternalRow = {
    // Spark's lower(): ASCII fast path, full String.toLowerCase beyond
    // (same normalization as ShingleHashes — tokens are the maximal
    // [a-z0-9] runs, i.e. normalizeText's space-splits)
    val str = text.toLowerCase.toString
    val len = str.length
    var toks = new Array[String](16)
    var m = 0
    var sumLen = 0L
    val hits = new Array[Int](sets.length)
    var i = 0
    while (i < len) {
      if (isAlnum(str.charAt(i))) {
        var j = i
        while (j < len && isAlnum(str.charAt(j))) j += 1
        val tok = str.substring(i, j)
        if (m == toks.length) toks = java.util.Arrays.copyOf(toks, m * 2)
        toks(m) = tok
        m += 1
        sumLen += tok.length
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(tok)) hits(l) += 1
          l += 1
        }
        i = j
      } else i += 1
    }
    // distinct space-joined grams — string equality, no hash-collision
    // risk (identical to array_distinct over concat_ws(" ", slice...))
    var nGrams = 0
    var nDistinct = 0
    if (m >= gramN) {
      nGrams = m - gramN + 1
      val seen = new java.util.HashSet[String](nGrams * 2)
      val sb = new java.lang.StringBuilder(32)
      var s = 0
      while (s < nGrams) {
        sb.setLength(0)
        var j = 0
        while (j < gramN) {
          if (j > 0) sb.append(' ')
          sb.append(toks(s + j))
          j += 1
        }
        if (seen.add(sb.toString)) nDistinct += 1
        s += 1
      }
    }
    InternalRow(m, sumLen,
      UnsafeArrayData.fromPrimitiveArray(hits), nGrams, nDistinct)
  }
}
