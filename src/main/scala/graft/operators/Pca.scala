package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed PCA for embedding columns — the
  * whitening / dimensionality-reduction step a vector pipeline runs
  * between embedding and indexing (smaller vectors = cheaper ANN,
  * decorrelated dims = better quantizers).
  *
  * Scale shape (the only shape that works at 10⁹ vectors):
  *  1. MOMENTS — one corpus pass accumulates the exact integer
  *     second-moment state of the ×1000-quantized vectors
  *     (the [[IvfAnn]] quantizer discipline): n, per-dim sums s_d,
  *     and the upper-triangle Gram Σ q_d·q_e. Accumulation is
  *     per-partition (mapPartitions → one packed Long array per
  *     partition, dim(dim+3)/2+1 longs) and the combine is Long
  *     addition — associative, order-free, bit-identical under ANY
  *     partitioning, and externally replayable (the x111 oracle
  *     re-derives every cell). The state is model-sized: 64 dims =
  *     2,145 longs, regardless of corpus size.
  *  2. EIGEN — covariance forms from the state on the driver
  *     (dim × dim doubles) and a cyclic Jacobi sweep diagonalizes it
  *     (fixed sweep order → deterministic); top-k eigenvectors by
  *     descending eigenvalue, sign-canonicalized (largest-|.|
  *     component positive) so the artifact is unique.
  *  3. PROJECT — the k component vectors ride into a map-only
  *     projection as literals ([[graft.functions.FloatDot]], one
  *     codegen'd loop per component): y_j = x·v_j − mean·v_j. No
  *     shuffle; the corpus is touched exactly twice end to end.
  *
  * Overflow: |q| ≤ ~10³ for unit-range embeddings, so each Gram term
  * is ≤ 10⁶ and the Long accumulator holds ~9·10¹² vectors; quantize
  * coarser (or shard the state and sum as DECIMAL) beyond that. */
object Pca {

  /** Exact integer moments of the quantized corpus: `s` per-dim sums,
    * `g` the upper triangle of Σ q·qᵀ (row-major: (d,e) d ≤ e at
    * offset d·dim − d(d−1)/2 + (e−d)). */
  final case class MomentState(n: Long, dim: Int, s: Array[Long],
      g: Array[Long])

  /** One corpus pass → the packed moment state. Rows with a null or
    * wrong-width vector are skipped (counted out of `n`). */
  def momentState(vecs: DataFrame, vecCol: String): MomentState = {
    import vecs.sparkSession.implicits._
    val dim = vecs.select(size(col(vecCol))).where(col(vecCol).isNotNull)
      .limit(1).as[Int].collect().headOption.getOrElse(
        throw new IllegalArgumentException("momentState: empty corpus"))
    val gLen = dim * (dim + 1) / 2
    val packedLen = 1 + dim + gLen
    val parts = vecs.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .mapPartitions { it =>
        val acc = new Array[Long](packedLen)
        val q = new Array[Long](dim)
        it.foreach { v =>
          if (v != null && v.length == dim) {
            var d = 0
            while (d < dim) {
              q(d) = math.floor(v(d) * 1000.0).toLong
              acc(1 + d) += q(d)
              d += 1
            }
            acc(0) += 1
            var off = 1 + dim
            d = 0
            while (d < dim) {
              var e = d
              while (e < dim) {
                acc(off) += q(d) * q(e)
                off += 1; e += 1
              }
              d += 1
            }
          }
        }
        Iterator.single(acc)
      }
    val total = parts.reduce { (a, b) =>
      val r = new Array[Long](packedLen)
      var i = 0
      while (i < packedLen) { r(i) = a(i) + b(i); i += 1 }
      r
    }
    MomentState(total(0), dim, total.slice(1, 1 + dim),
      total.slice(1 + dim, packedLen))
  }

  /** Covariance (in ORIGINAL units) from the integer state:
    * C = (G/n − mean·meanᵀ) · 10⁻⁶. */
  def covariance(st: MomentState): Array[Array[Double]] = {
    require(st.n > 0, "covariance: empty state")
    val d = st.dim
    val mean = st.s.map(_.toDouble / st.n)
    val c = Array.ofDim[Double](d, d)
    var off = 0
    for (i <- 0 until d; j <- i until d) {
      val v = (st.g(off).toDouble / st.n - mean(i) * mean(j)) * 1e-6
      c(i)(j) = v; c(j)(i) = v
      off += 1
    }
    c
  }

  /** Cyclic Jacobi diagonalization — fixed (p, q) sweep order, so the
    * decomposition is deterministic. Returns (eigenvalues descending,
    * matching eigenvectors as rows, sign-canonicalized). */
  def eigenSym(m0: Array[Array[Double]], sweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-14) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // canonical sign: the largest-magnitude component reads positive
      val m = col.indices.maxBy(j => (math.abs(col(j)), -j))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Top-k principal components of the corpus: one moments pass +
    * driver-side eigen. Returns (explained variances descending,
    * component rows, per-dim mean in original units). */
  def fit(vecs: DataFrame, vecCol: String, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val st = momentState(vecs, vecCol)
    val (vals, comps) = eigenSym(covariance(st))
    val mean = st.s.map(_.toDouble / st.n * 1e-3)
    (vals.take(k), comps.take(k), mean)
  }

  /** Map-only projection under a fitted model: appends `outCol` =
    * array(k doubles), y_j = (x − mean)·v_j, each dot one codegen'd
    * [[graft.functions.FloatDot]] loop with the component inlined as
    * a literal. */
  def project(df: DataFrame, vecCol: String, outCol: String,
      components: Array[Array[Double]], mean: Array[Double]): DataFrame = {
    val dots: Seq[Column] = components.toIndexedSeq.map { comp =>
      val shift = comp.zip(mean).map { case (c, m) => c * m }.sum
      Similarity.dot(col(vecCol), typedlit(comp.toSeq)) - lit(shift)
    }
    df.withColumn(outCol, array(dots: _*))
  }
}
