package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Two tiers (the prompt's contract):
  *  - [[bruteForceTopK]] — exact cosine top-k, query-side broadcast;
  *    the baseline and the oracle-checkable path. O(|Q| * |corpus|)
  *    but embarrassingly parallel: with the small query set broadcast,
  *    it is a map-only scan of the corpus followed by one top-k
  *    aggregation per query.
  *  - [[hyperplaneBucket]]-blocked search — sign-LSH (random
  *    hyperplanes with a fixed seed) so the corpus is bucketed once
  *    and each query probes one bucket: the 100 TB path, trading
  *    recall for a ~2^planes fan-in reduction.
  *
  * Vector math: the per-PAIR hot scalar (dot/cosine) is the codegen'd
  * [[graft.functions.FloatDot]] expression; per-ROW bucketing uses
  * integer column algebra (engine-portable sign decisions). No UDFs,
  * no driver collect.
  */
object Similarity {

  /** Dot product of two `array<float>` vectors, accumulated in double:
    * the codegen'd [[graft.functions.FloatDot]] primitive (same
    * left-to-right fold as the HOF form, so numerically identical —
    * but no interpreted lambda per element; this is the hot scalar of
    * every pair join in the similarity path). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.FloatDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe zero when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Cosine from precomputed norms — ONE vector pass (the dot) per
    * pair. Join-heavy callers compute each side's norm once per row
    * before the pair join instead of three HOF passes per pair. */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Shared ranking tail of every similarity search: per query, the
    * `k` best candidates by (cosine DESC, id ASC) as (query_id,
    * neighbor_id, cosine, rank) rows.
    *
    * This is a k-bounded hash aggregate over the codegen-adjacent
    * [[graft.functions.TopKPairs]] buffer, NOT a `row_number()`
    * window: the window form shuffles and sorts every candidate pair
    * per query, while the aggregate combines candidates map-side into
    * k-slot buffers, so the shuffle carries at most k pairs per
    * (query, task) and the losers die where they were scored — the
    * difference between O(|candidates|) and O(|queries| * k) shuffle
    * rows at corpus scale. Identical results (same total order, ids
    * unique per query). Requires an integral candidate id.
    *
    * Ranking contract (stricter than a `row_number()` window, by
    * design): null and NaN cosines NEVER rank — they are dropped here
    * before the aggregate, so a query with fewer than k finite-scored
    * candidates returns fewer than k rows. The window form would pad
    * with null-cosine rows (desc ordering sorts nulls last) and order
    * NaN greatest; both are corrupt-vector artifacts a ranking should
    * surface by absence, not emit as "neighbors". */
  private[graft] def rankTopK(joined: DataFrame, queryId: String,
      corpusId: String, k: Int): DataFrame = {
    val idType = joined.schema(corpusId).dataType
    joined
      // NaN -> dropped (null comparison is null -> filtered), so the
      // buffer's >/== comparisons never see NaN and the null-skip in
      // TopKPairs.update is the single no-rank path
      .where(!isnan(col("cosine")))
      .groupBy(col(queryId).as("query_id"))
      .agg(graft.functions.TopKPairs.column(
        col("cosine"), col(corpusId).cast("long"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("query_id"),
        col("__s.id").cast(idType).as("neighbor_id"),
        col("__s.cosine").as("cosine"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k: for each row of `queries`, the `k` nearest corpus
    * rows by cosine. Queries are explicitly broadcast (small side);
    * ranking is the bounded [[rankTopK]] aggregate. Norms are computed
    * once per corpus row / query row, not per pair. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val c = Rebalance(corpus.select(col(corpusId), col(corpusVec)))
      .withColumn("__cn", norm(col(corpusVec)))
    val q = queries.withColumn("__qn", norm(col(queryVec)))
    val joined = c.join(broadcast(q))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosineWithNorms(
        col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    rankTopK(joined, queryId, corpusId, k)
  }

  /** Symmetric int8 quantization of the embedding column — see
    * [[graft.functions.Int8Vec]]: `struct<scale double, q array<tinyint>>`,
    * 4× smaller than float32 at rest and on the candidate-scoring scan. */
  def int8Quantize(vec: Column): Column =
    graft.functions.Int8Vec.quantizeCol(vec)

  /** Approximate cosine between two int8-quantized vectors. The scales
    * cancel: `Σ q_a·q_b / sqrt(Σ q_a² · Σ q_b²)` — three exact integer
    * sums and one double division, within ~2·√dim/127 of exact cosine.
    * Use for candidate scoring over a quantized index, then rerank the
    * survivors with full-precision [[cosine]]. */
  def approxCosineInt8(qa: Column, qb: Column): Column =
    approxCosineInt8WithNorms(qa, qb,
      graft.functions.Int8Vec.dotCol(qa, qa),
      graft.functions.Int8Vec.dotCol(qb, qb))

  /** Approximate cosine from precomputed integer self-dots — ONE
    * vector pass (the cross dot) per pair, like [[cosineWithNorms]]. */
  def approxCosineInt8WithNorms(qa: Column, qb: Column,
      qqA: Column, qqB: Column): Column = {
    val dq = graft.functions.Int8Vec.dotCol(qa, qb).cast("double")
    when(qqA > 0 && qqB > 0,
      dq / sqrt(qqA.cast("double") * qqB.cast("double"))).otherwise(lit(0.0))
  }

  /** Per-group mean embedding (centroid pooling): posexplode the
    * vectors, average per (group, dimension), re-assemble in dimension
    * order. Both aggregations are codegen'd hash aggregates keyed on
    * small fixed-width tuples — no driver collect, no vector UDAF —
    * so this is the 100 TB shape for building class/cluster/source
    * centroids. */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("g"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(avg(col("v").cast("double")).as("av"))
      .groupBy("g").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("av")))),
          s => s.getField("av")).as("centroid"))
      .withColumnRenamed("g", groupCol)

  /** kNN label vote over a PRECOMPUTED neighbors frame — the
    * composition point for every search tier: pass the output of
    * [[bruteForceTopK]] (exact), [[bucketedTopK]]/[[multiProbeTopK]]
    * (sign-LSH), or [[IvfAnn.topKInt]]/[[IvfAnn.searchIndexInt]] (IVF,
    * including the persisted partition-pruned index — the 100 TB tier;
    * at that scale the brute-force neighbor stage, not the vote, is
    * the cost, so the tier choice must be the caller's). `neighbors`
    * needs (query_id, neighbor_id) rows, at most `k` per query — the
    * shared [[rankTopK]] contract every tier emits.
    *
    * Ties break to the SMALLEST label — fully deterministic, no
    * window. The per-query vote table is at most `k` rows, so the
    * argmax is a single `max(struct(votes, -label))` hash aggregate:
    * max votes first, then (via the negated label) the smallest
    * label — never a row_number over the vote rows. The label join
    * keys on neighbor_id, |Q| * k rows against the corpus's
    * (id, label) projection — at scale that side prunes to two
    * columns at the scan, and the |Q|*k side is the broadcast
    * candidate.
    *
    * Output: (query_id, predicted_label, votes). */
  def knnClassifyFromNeighbors(neighbors: DataFrame, corpus: DataFrame,
      corpusId: String, labelCol: String): DataFrame = {
    val labels = corpus.select(
      col(corpusId).as("neighbor_id"), col(labelCol).as("__label"))
    neighbors.join(labels, "neighbor_id")
      .groupBy("query_id", "__label").agg(count(lit(1)).as("votes"))
      .groupBy("query_id")
      .agg(max(struct(col("votes"), (-col("__label")).as("__neg"),
        col("__label").as("__l"))).as("__best"))
      .select(col("query_id"),
        col("__best.__l").as("predicted_label"),
        col("__best.votes").as("votes"))
  }

  /** kNN label vote over the EXACT top-k neighbors (the
    * oracle-checkable baseline tier): [[bruteForceTopK]] then
    * [[knnClassifyFromNeighbors]]. For corpora where a full scan per
    * query batch is not affordable, run the vote over an ANN tier's
    * neighbors instead — same vote, caller-chosen search. */
  def knnClassify(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, labelCol: String,
      queryId: String, queryVec: String, k: Int): DataFrame =
    knnClassifyFromNeighbors(
      bruteForceTopK(corpus, queries, corpusId, corpusVec, queryId, queryVec, k),
      corpus, corpusId, labelCol)

  /** Deterministic integer hyperplanes: plane p's weight for dimension
    * d is an LCG draw in [-500000, 500000] — plain modular arithmetic
    * that any engine can replay (a seeded `Random` stream cannot be).
    * The matrix is a pure function of (dim, planes); nothing is
    * shipped with the plan. */
  private[graft] def portablePlanes(dim: Int, planes: Int): IndexedSeq[IndexedSeq[Long]] =
    IndexedSeq.tabulate(planes, dim) { (p, d) =>
      graft.functions.HyperplaneBucket.planeWeight(p, d, dim)
    }

  /** Sign-LSH bucket id: bit p = sign(v . plane_p). Vectors with high
    * cosine land in the same bucket with probability
    * (1 - theta/pi)^planes.
    *
    * The projection is computed in EXACT integer arithmetic — vector
    * components quantized to floor(x * 1e6), integer plane weights —
    * so the sign decision has no floating-point summation-order
    * sensitivity: the same vector lands in the same bucket on every
    * engine and every partitioning. |weight * q| <= 5e11 per term,
    * * 64 dims < 2^63: overflow-free.
    *
    * Computed by the codegen'd [[graft.functions.HyperplaneBucket]]
    * expression — one dim × planes primitive loop per row, replacing
    * `planes` interpreted `aggregate(zip_with(...))` folds. */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int): Column =
    graft.functions.HyperplaneBucket.column(vec, dim, planes)

  /** Bucketed ANN top-k: probe only the query's own bucket. Recall is
    * tunable via `planes` (fewer planes = bigger buckets = higher
    * recall, more compute). */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      dim: Int, k: Int, planes: Int = 6): DataFrame =
    multiProbeTopK(corpus, queries, corpusId, corpusVec, queryId, queryVec,
      dim, k, planes, probeHamming = 0)

  /** Multi-probe sign-LSH top-k: each query probes its own bucket PLUS
    * every bucket within Hamming distance `probeHamming` of it (the
    * standard recall fix for bucketed search — a near neighbor that
    * fell just across one hyperplane is recovered without shrinking
    * `planes`). Cost grows with the probe-set size (1 + planes for
    * distance 1); the corpus is still bucketed ONCE, map-only, and the
    * probe explosion happens on the tiny broadcast query side. Fully
    * deterministic: probe buckets are integer XOR bit flips of the
    * integer-projection bucket. */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      dim: Int, k: Int, planes: Int = 6, probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1,
      s"probeHamming must be 0 or 1, got $probeHamming")
    val c = Rebalance(corpus.select(col(corpusId), col(corpusVec)))
      .withColumn("__bucket", hyperplaneBucket(col(corpusVec), dim, planes))
      .withColumn("__cn", norm(col(corpusVec)))
    val own = hyperplaneBucket(col(queryVec), dim, planes)
    val probeSet =
      if (probeHamming == 0) array(own)
      else array(own +: (0 until planes).map(p => own.bitwiseXOR(lit(1L << p))): _*)
    val q = queries
      .withColumn("__bucket", explode(probeSet))
      .withColumn("__qn", norm(col(queryVec)))
    // a corpus row lives in exactly one bucket, so probe fan-out can
    // not duplicate candidate pairs — no distinct needed before rank
    val joined = c.join(broadcast(q), Seq("__bucket"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosineWithNorms(
        col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    rankTopK(joined, queryId, corpusId, k)
  }
}
