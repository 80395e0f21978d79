package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (PQ) for vector search at memory scale
  * (Jégou, Douze, Schmid 2011): split the d-dim vector into `m`
  * subspaces, learn a small codebook per subspace, and store each
  * vector as its m nearest-codeword ids — 20k-dim float storage
  * becomes m small integers (8 bytes at m=8), which is what makes a
  * 100 TB corpus's vectors fit an ANN tier at all. Search is ADC
  * (asymmetric distance computation): per query, one m×ncode distance
  * table; a corpus row's approximate distance is m table lookups —
  * the vectors themselves are never read again.
  *
  * The house determinism discipline applies end to end: codebooks are
  * SEED-GROUP centroids over the ×1000-quantized integer vectors
  * (the [[IvfAnn.seedCentroidsInt]] rule — a pure function of the
  * data, bit-replayable externally, unlike iterative k-means),
  * encoding is exact-integer argmin with ties to the lower code, and
  * ADC sums are exact Longs — the x125/x126 oracles replay codebooks,
  * codes, tables, and rankings bit-for-bit. And the lossy tier ships
  * its measured loss: [[recallAudit]] reports ADC recall against the
  * exact integer ranking.
  *
  * Scale shape: train = one posexplode + one (ncode × d)-cell hash
  * agg; encode = m invocations of the codegen'd
  * [[graft.functions.NearestCells]] argmin over sliced subvectors
  * (map-only); search = the query batch's model-sized distance tables
  * joined against the CODES relation (m small ints per corpus row —
  * the shuffle carries codes and table rows, never vectors). */
object Pq {

  /** words(s)(c)(d): codeword c of subspace s, dimension d within the
    * subspace — rounded integer means in the ×1000 quantized space. */
  case class Codebook(m: Int, subDim: Int, ncode: Int,
      words: Array[Array[Array[Long]]])

  private def quantize3(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000.0)).cast("long"))

  /** Train the deterministic seeded codebook: codeword c of every
    * subspace is the rounded integer mean of the quantized subvectors
    * of rows with `pmod(id, ncode) == c` — one scan, one bounded hash
    * agg, model-sized result. */
  def trainSeeded(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ncode: Int): Codebook = {
    val rows = corpus
      .select(pmod(col(idCol), lit(ncode)).cast("int").as("c"),
        posexplode(quantize3(col(vecCol))).as(Seq("pos", "qv")))
      .groupBy("c", "pos")
      .agg(sum("qv").as("s"), count(lit(1)).as("n"))
      .collect()
    require(rows.nonEmpty, "Pq.trainSeeded: empty corpus")
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    require(dim % m == 0, s"Pq.trainSeeded: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val words = Array.fill(m, ncode)(new Array[Long](subDim))
    rows.foreach { r =>
      val pos = r.getInt(1)
      words(pos / subDim)(r.getInt(0))(pos % subDim) =
        math.floor(r.getLong(2).toDouble / r.getLong(3) + 0.5).toLong
    }
    Codebook(m, subDim, ncode, words)
  }

  /** The m-code encoding of `vec` as an array<int> column: per
    * subspace, the exact-integer argmin codeword (ties to the lower
    * code) via the codegen'd NearestCells expression over the sliced
    * subvector. Map-only. */
  def encode(vec: Column, cb: Codebook): Column =
    array((0 until cb.m).map { s =>
      element_at(graft.functions.NearestCells.nearestIntCol(
        slice(vec, s * cb.subDim + 1, cb.subDim),
        cb.words(s), (0 until cb.ncode).toArray, 1), 1)
    }: _*)

  /** The codebook as a model-sized relation (s, c, d, w) — the join
    * form of the literal model, for relational ADC. */
  def codebookRelation(spark: org.apache.spark.sql.SparkSession,
      cb: Codebook): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until cb.m; c <- 0 until cb.ncode; d <- 0 until cb.subDim)
      yield (s, c, d, cb.words(s)(c)(d))).toDF("s", "c", "d", "w")
  }

  /** Per-query ADC distance tables: (qid, s, c, dist) with dist = the
    * exact integer L2² between the query's quantized subvector and
    * codeword (s, c). One fan-out of the QUERY batch (d rows each)
    * joined against the broadcast codebook — m·ncode rows per query. */
  def distTables(queries: DataFrame, qid: String, qvec: String,
      cb: Codebook): DataFrame = {
    val q = queries.select(col(qid).as("qid"),
        posexplode(quantize3(col(qvec))).as(Seq("pos", "qv")))
      .withColumn("s", (col("pos") / cb.subDim).cast("int"))
      .withColumn("d", pmod(col("pos"), lit(cb.subDim)).cast("int"))
    q.join(broadcast(codebookRelation(queries.sparkSession, cb)),
        Seq("s", "d"))
      .groupBy("qid", "s", "c")
      .agg(sum(expr("(qv - w) * (qv - w)")).as("dist"))
  }

  /** ADC top-k: the codes relation (id, codes) fans out to its m
    * (s, c) lookups, joins the query tables, sums per (qid, id), and
    * ranks by (adc, id). The shuffle carries codes and exact-Long
    * partial sums — never vectors. */
  def searchAdc(codes: DataFrame, dtab: DataFrame, k: Int): DataFrame = {
    val e = codes.select(col("id"), posexplode(col("codes")).as(Seq("s", "c")))
    e.join(dtab, Seq("s", "c"))
      .groupBy("qid", "id")
      .agg(sum("dist").as("adc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy("adc", "id")))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("adc"))
  }

  /** End-to-end ADC search over raw relations: train is the caller's
    * (pass the codebook), corpus is encoded on the fly (index the
    * codes relation with [[encode]] for the persisted form). */
  def topKAdc(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      cb: Codebook, k: Int): DataFrame =
    searchAdc(
      corpus.select(col(corpusId).as("id"),
        encode(col(corpusVec), cb).as("codes")),
      distTables(queries, queryId, queryVec, cb), k)

  /** MEASURED loss of the PQ tier: ADC top-k vs the EXACT integer-L2²
    * top-k (both deterministic, ties by id), one row:
    * (k, n_queries, n_hits, recall_ppm). */
  def recallAudit(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      cb: Codebook, k: Int): DataFrame = {
    val approx = topKAdc(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, cb, k)
    val c = corpus.select(col(corpusId).as("id"),
      quantize3(col(corpusVec)).as("cv"))
    val q = queries.select(col(queryId).as("qid"),
      quantize3(col(queryVec)).as("qv"))
    val exact = q.crossJoin(c)
      .select(col("qid"), col("id"),
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy("d2", "id")))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"))
    approx.join(exact, Seq("qid", "id"))
      .agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(queries.agg(
        count(lit(1)).cast("long").as("n_queries"))))
      .select(lit(k).cast("long").as("k"), col("n_queries"), col("n_hits"),
        expr(s"(n_hits * CAST(1000000 AS BIGINT)) DIV (n_queries * $k)")
          .as("recall_ppm"))
  }
}
