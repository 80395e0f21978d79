package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into `nlist` Voronoi cells around KMeans centroids, then
  * answer queries by scanning only the `nprobe` closest cells.
  *
  * Scale shape (the path brute force can't take at 100 TB):
  *  - TRAIN on a bounded sample (`fit` over `sampleFraction` of the
  *    corpus) — the only non-distributed artifact is the centroid
  *    matrix, `nlist × dim` doubles, which is broadcast as a literal;
  *  - ASSIGN is a map-only scan (argmin over centroid distances, all
  *    column algebra) — at scale this materializes as a partitioned
  *    parquet write, i.e. the "index";
  *  - SEARCH explodes each query into its `nprobe` cells and
  *    equi-joins on cell id, so the candidate scan is
  *    `nprobe/nlist` of the corpus per query instead of all of it.
  */
object IvfAnn {

  /** Squared L2 distance between a vector column and a literal centroid. */
  private def sqDist(vec: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(centroid), (x, c) => {
        val d = x.cast("double") - c; d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Train centroids with ml KMeans on a corpus sample. Returns the
    * centroid matrix (tiny, driver-side by construction). */
  def trainCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val sample = if (sampleFraction >= 1.0) corpus else
      corpus.sample(withReplacement = false, sampleFraction, seed)
    val train = sample.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20).fit(train)
    model.clusterCenters.map(_.toArray)
  }

  /** Nearest-centroid cell id (argmin of squared distance) as a pure
    * column expression over the literal centroid matrix. */
  def cellId(vec: Column, centroids: Array[Array[Double]]): Column = {
    // struct(dist, idx) compared lexicographically: least() = argmin,
    // ties to the lower cell id.
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(vec, c).as("d"), lit(i).as("i"))
    }
    least(scored.toIndexedSeq: _*).getField("i")
  }

  /** The `nprobe` nearest cell ids for a query vector, as an array. */
  def probeCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(vec, c).as("d"), lit(i).as("i"))
    }.toIndexedSeq: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("i"))
  }

  /** End-to-end IVF top-k search: assign corpus rows to cells once,
    * explode queries into their probe cells, equi-join on cell, exact
    * cosine within candidates, rank per query. */
  def topK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    val c = Rebalance(corpus.select(col(corpusId), col(corpusVec)))
      .withColumn("__cell", cellId(col(corpusVec), centroids))
      .withColumn("__cn", Similarity.norm(col(corpusVec)))
    val q = queries
      .withColumn("__cell", explode(probeCells(col(queryVec), centroids, nprobe)))
      .withColumn("__qn", Similarity.norm(col(queryVec)))
    val joined = c.join(broadcast(q), Seq("__cell"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("cosine", Similarity.cosineWithNorms(
        col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cosine").desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
