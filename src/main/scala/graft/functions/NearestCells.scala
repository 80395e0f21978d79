package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expressions for IVF cell assignment: the `nprobe`
  * nearest centroids of an embedding vector, ordered by (distance,
  * cell id) ascending, in ONE pass over the centroid matrix.
  *
  * Why Expressions: the column-algebra form computed one
  * `aggregate(zip_with(...))` fold PER CENTROID per row — interpreted
  * (CodegenFallback), boxed-lambda-per-element; at nlist=1024 that is
  * the dominant cost of corpus assignment at scale. Here assignment is
  * one tight `nlist × dim` primitive loop inside whole-stage codegen,
  * and the centroid matrix rides along as a plan reference object
  * (tiny: nlist × dim), not as literals.
  *
  * Two variants, sharing the search shape:
  *  - [[NearestCellsInt]] — the deterministic integer quantizer path
  *    ([[graft.operators.IvfAnn.seedCentroidsInt]]): components
  *    quantized to `floor(x * 1e3)`, exact long distance
  *    `sum((q_d - c_d)^2)` — bit-identical to the zip_with form and to
  *    the external DuckDB oracle replay.
  *  - [[NearestCellsDouble]] — the ml-KMeans path: double distance
  *    `sum((x_d - c_d)^2)` accumulated left-to-right in index order,
  *    the same fold order as the zip_with form, so assignments are
  *    bit-identical to it.
  *
  * Ordering contract (matches `array_sort(struct(d, i))` /
  * `least(struct(d, i))`): ascending by distance, ties to the lower
  * cell id. Null contract: a NULL array, a length != dim, or any NULL
  * element yields NULL.
  */
private[graft] trait NearestCellsLike extends UnaryExpression {
  def nprobe: Int
  def ncells: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nprobe >= 1 && ncells >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs nprobe >= 1 and a non-empty centroid set, " +
        s"got (nprobe=$nprobe, ncells=$ncells)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
}

/** Integer-quantizer variant; `cents(k)` is cell k's rounded integer
  * centroid, `cellIds(k)` its id. Arrays are compared by reference in
  * the case-class equality — fine: each operator call builds its own
  * instance and nothing relies on cross-plan dedup. */
case class NearestCellsInt(child: Expression, cents: Array[Array[Long]],
    cellIds: Array[Int], nprobe: Int) extends NearestCellsLike {

  override def ncells: Int = cents.length
  override def prettyName: String = "nearest_cells_int"

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.nearestInt(input.asInstanceOf[ArrayData], cents, cellIds, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val idsRef = ctx.addReferenceObj("cellIds", cellIds, "int[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NearestCells.nearestInt(
        $c, $centsRef, $idsRef, $nprobe);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsInt =
    copy(child = newChild)
}

/** Double (ml-KMeans centroid) variant; cell ids are the row indices
  * of the centroid matrix, 0..nlist-1. */
case class NearestCellsDouble(child: Expression, cents: Array[Array[Double]],
    nprobe: Int) extends NearestCellsLike {

  override def ncells: Int = cents.length
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.nearestDouble(input.asInstanceOf[ArrayData], cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NearestCells.nearestDouble(
        $c, $centsRef, $nprobe);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsDouble =
    copy(child = newChild)
}

object NearestCells {

  /** Column surfaces. */
  def nearestIntCol(c: Column, cents: Array[Array[Long]], cellIds: Array[Int],
      nprobe: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCellsInt(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        cents, cellIds, nprobe))

  def nearestDoubleCol(c: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCellsDouble(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        cents, nprobe))

  /** Shared tail: given per-cell distances (compared via `lt`) pick the
    * `nprobe` smallest by (distance, id) with a partial selection sort —
    * nlist is small (16..4096) and nprobe tiny, so O(nprobe * nlist)
    * comparisons beat a full sort's allocation. */
  private def select(ids: Array[Int], n: Int, nprobe: Int,
      lt: (Int, Int) => Boolean): ArrayData = {
    val order = new Array[Int](n)
    var i = 0
    while (i < n) { order(i) = i; i += 1 }
    val take = math.min(nprobe, n)
    val out = new Array[Int](take)
    var s = 0
    while (s < take) {
      var best = s
      var j = s + 1
      while (j < n) {
        val a = order(j); val b = order(best)
        if (lt(a, b) || (!lt(b, a) && ids(a) < ids(b))) best = j
        j += 1
      }
      val t = order(s); order(s) = order(best); order(best) = t
      out(s) = ids(order(s))
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The primitive loops — shared by interpreted eval and codegen. */
  def nearestInt(arr: ArrayData, cents: Array[Array[Long]], cellIds: Array[Int],
      nprobe: Int): ArrayData = {
    val n = cents.length
    val dim = cents(0).length
    if (arr.numElements() != dim) return null
    val q = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return null
      q(d) = math.floor(arr.getFloat(d).toDouble * 1000.0).toLong
      d += 1
    }
    val dist = new Array[Long](n)
    var k = 0
    while (k < n) {
      val c = cents(k)
      var s = 0L
      var i = 0
      while (i < dim) {
        val t = q(i) - c(i)
        s += t * t
        i += 1
      }
      dist(k) = s
      k += 1
    }
    select(cellIds, n, nprobe, (a, b) => dist(a) < dist(b))
  }

  def nearestDouble(arr: ArrayData, cents: Array[Array[Double]],
      nprobe: Int): ArrayData = {
    val n = cents.length
    val dim = cents(0).length
    if (arr.numElements() != dim) return null
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return null
      x(d) = arr.getFloat(d).toDouble
      d += 1
    }
    val dist = new Array[Double](n)
    val ids = new Array[Int](n)
    var k = 0
    while (k < n) {
      val c = cents(k)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val t = x(i) - c(i)
        s += t * t
        i += 1
      }
      dist(k) = s
      ids(k) = k
      k += 1
    }
    select(ids, n, nprobe, (a, b) => dist(a) < dist(b))
  }
}
