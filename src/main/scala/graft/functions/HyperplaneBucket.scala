package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the full sign-LSH bucket id of an
  * embedding vector in ONE pass — quantize each component to
  * `floor(x * 1e6)` (long), project against every deterministic
  * integer hyperplane, pack the sign bits into one long. Bit p is
  * `sum_d(q_d * w_pd) >= 0`. Arithmetic is identical to the
  * column-algebra form `aggregate(zip_with(q, w_p, *), 0, +)` per
  * plane — exact integer math, so the same vector lands in the same
  * bucket on every engine and every partitioning, and the external
  * DuckDB oracle replays it bit-for-bit.
  *
  * Why an Expression: the column form was `planes` independent
  * higher-order-function folds, each interpreted (CodegenFallback)
  * with a boxed lambda frame per element — the per-ROW hot path of
  * bucketed ANN and embedding near-dup at corpus scale. Here it is
  * one tight primitive loop (dim × planes integer mul-adds, no
  * boxing) inside whole-stage codegen.
  *
  * The plane matrix is a pure function of (dim, planes) — the LCG
  * draw `((1103515245 * (p*dim + d + 1) + 12345) mod 2^31) mod
  * 1000001 - 500000` — generated once per JVM and cached; nothing is
  * shipped with the plan. |w| <= 5e5 and |q| <= ~1e6·|x|, so for
  * unit-range embeddings every projection term is <= ~5e11 and a
  * 64-bit accumulator is overflow-free up to thousands of dimensions.
  *
  * Null contract: a NULL array, a length != `dim`, or any NULL
  * element yields NULL (the column form folded such rows into bucket
  * 0 via null-poisoned projections; NULL is the honest answer and
  * keeps corrupt vectors out of every bucket instead of piling them
  * into bucket 0).
  */
case class HyperplaneBucket(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if dim >= 1 && planes >= 1 && planes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs dim >= 1 and planes in [1, 62], got ($dim, $planes)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucket.bucket(input.asInstanceOf[ArrayData], dim, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_b =
        graft.functions.HyperplaneBucket.bucket($c, $dim, $planes);
      if (${ev.value}_b == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_b.longValue();
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** `Column` surface (no session registration needed). */
  def column(c: Column, dim: Int, planes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HyperplaneBucket(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        dim, planes))

  /** Plane p, dimension d weight — the deterministic LCG draw in
    * [-500000, 500000] any engine can replay. */
  def planeWeight(p: Int, d: Int, dim: Int): Long = {
    val v = (1103515245L * (p.toLong * dim + d + 1) + 12345L) % 2147483648L
    v % 1000001L - 500000L
  }

  // flattened plane-major weight matrix per (dim, planes), computed
  // once per JVM (executors cache independently; tiny and immutable)
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()
  private def weights(dim: Int, planes: Int): Array[Long] =
    planeCache.computeIfAbsent((dim, planes), { case (dm, ps) =>
      Array.tabulate(ps * dm)(i => planeWeight(i / dm, i % dm, dm))
    })

  /** The primitive loop — shared by interpreted eval and codegen. */
  def bucket(arr: ArrayData, dim: Int, planes: Int): java.lang.Long = {
    if (arr.numElements() != dim) return null
    val q = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return null
      q(d) = math.floor(arr.getFloat(d).toDouble * 1000000.0).toLong
      d += 1
    }
    val w = weights(dim, planes)
    var bucketBits = 0L
    var p = 0
    while (p < planes) {
      var s = 0L
      val off = p * dim
      var i = 0
      while (i < dim) {
        s += q(i) * w(off + i)
        i += 1
      }
      if (s >= 0) bucketBits |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(bucketBits)
  }
}
