package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full k-slot MinHash signature of a
  * shingle-hash set in ONE pass over the array. Slot i is
  * `min over s of (a_i * (s mod P) + b_i) mod P` with the
  * [[PortableHash]] affine family over the Mersenne prime P = 2^31-1 —
  * bit-identical to the column-algebra form
  * `array_min(transform(hs, s -> perm(i, s)))` per slot, and therefore
  * to the external DuckDB oracle replay.
  *
  * Why an Expression: the column-algebra form is k independent
  * higher-order-function folds — Spark evaluates HOFs interpreted
  * (CodegenFallback), so signature generation was k × |hs| boxed
  * lambda frames per document AND a k-wide projection for janino to
  * compile. This is the hot map stage of MinHash dedup at corpus
  * scale; here it is one tight primitive loop (|hs| × k integer ops,
  * no boxing) inside whole-stage codegen, and the generated projection
  * carries ONE expression instead of k.
  *
  * Contract: input `array<long>` of 60-bit-positive shingle hashes
  * ([[PortableHash.md5Hash60]]); null elements are ignored; an empty
  * (or all-null) set yields NULL — the same "no shingles, no
  * signature" outcome as `array_min` of an empty array per slot.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 && k <= MinHashSig.MaxK =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig k must be in [1, ${MinHashSig.MaxK}], got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an ARRAY<BIGINT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.sig($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Upper bound on k — a guard against absurd per-row allocation, far
    * above any real signature width (128–256 is the practical range). */
  val MaxK = 4096

  /** `Column` surface (no session registration needed). */
  def column(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(c), k))

  // coefficient vectors per k, computed once per JVM (executors cache
  // independently; the arrays are tiny and immutable)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, (kk: Integer) =>
      (Array.tabulate(kk.intValue)(PortableHash.permA),
        Array.tabulate(kk.intValue)(PortableHash.permB)))

  /** The primitive loop — shared by interpreted eval and codegen.
    * Arithmetic matches the column form exactly: `%` keeps the
    * dividend's sign (Java and Spark agree), and every intermediate
    * fits in a long (a < P, |h mod P| < P ⇒ |a*(h mod P)+b| < 2^62). */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coeffs(k)
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val hm = arr.getLong(j) % PortableHash.MinHashP
        var i = 0
        while (i < k) {
          val v = (as(i) * hm + bs(i)) % PortableHash.MinHashP
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(out)
  }
}
