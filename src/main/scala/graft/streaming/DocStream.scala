package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming surface for the `documents` table shape — the
  * streaming form of corpus INTAKE: documents land in the lake
  * continuously, and the map-only curation stages (clean → language /
  * quality / length scoring → filter) plus content-fingerprint dedup
  * run incrementally instead of as a nightly batch.
  *
  * Everything before the dedup is stateless column algebra — the SAME
  * expression trees [[graft.operators.Curate]] uses — so the streaming
  * and batch forms agree by construction. The dedup is
  * `dropDuplicates(fingerprint)`: state is one 32-char digest per
  * distinct surviving document, which is the irreducible state of
  * exact streaming dedup (to ever drop a duplicate of a document you
  * must remember you saw it). At 100 TB of history, keep the streaming
  * dedup scoped to a rolling intake window and run the lake-wide pass
  * as the incremental batch join ([[graft.operators.Dedup
  * .incrementalSurvivors]], query x20) — the state then lives in the
  * lake, not the state store.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of document parquet files. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Map-only intake stages (stateless, identical in stream and batch):
    * clean, score from the ONE-PASS stats struct (the lambda-free form
    * that survives predicate-pushdown inlining — see
    * [[TextAnalysis.docStats]]), filter. */
  private def scoreAndFilter(docs: DataFrame, langs: Seq[String],
      minQuality: Double, minTokens: Int): DataFrame = {
    val cleaned = docs.withColumn("__clean", TextAnalysis.cleanText(col("text")))
      .withColumn("__stats", TextAnalysis.docStats(col("__clean")))
      .withColumn("lang_id", TextAnalysis.langIdFromStats(col("__stats")))
      .withColumn("quality",
        TextAnalysis.qualityScoreFromStats(col("__clean"), col("__stats")))
    cleaned
      .where(col("lang_id").isin(langs: _*) &&
        col("__stats").getField("n_tokens") >= minTokens &&
        col("quality") >= minQuality)
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("__clean")))
      .select(col("doc_id"), col("fingerprint"), col("lang_id"),
        col("quality"), col("__clean").as("text"))
  }

  /** Streaming intake: filter + first-arrival-wins fingerprint dedup.
    * The survivor of a duplicate group is the first to ARRIVE (the
    * streaming notion of "first"); the batch twin's survivor is the
    * min doc_id — compare the two on fingerprint SETS, which agree
    * exactly. */
  def intake(docs: DataFrame, langs: Seq[String] = Seq("en", "und"),
      minQuality: Double = 0.0, minTokens: Int = 1): DataFrame =
    scoreAndFilter(docs, langs, minQuality, minTokens)
      .dropDuplicates("fingerprint")

  /** Batch twin of [[intake]] — same stages on a bounded frame, min
    * doc_id as the deterministic survivor. */
  def intakeBatch(docs: DataFrame, langs: Seq[String] = Seq("en", "und"),
      minQuality: Double = 0.0, minTokens: Int = 1): DataFrame = {
    val scored = scoreAndFilter(docs, langs, minQuality, minTokens)
    val firstPerFp = scored.groupBy("fingerprint")
      .agg(min(col("doc_id")).as("doc_id"))
    scored.join(firstPerFp, Seq("fingerprint", "doc_id"))
  }
}
