package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Multimodal}

/** Structured-Streaming surface for MEDIA intake — the streaming form
  * of [[graft.pipeline.RunMedia]]'s image stage: payloads land in the
  * lake continuously and each micro-batch is fingerprinted through
  * the REAL decodes and deduplicated against ALL history via the
  * persisted Hamming index ([[Dedup.hammingIntakeStep]] — first-wins,
  * re-delivery-idempotent).
  *
  * The state story mirrors the text tiers: exact streaming dedup
  * keeps digests in the state store, fuzzy/fingerprint streaming
  * dedup keeps its state in the LAKE (the index), where a 100 TB
  * media corpus's signatures actually fit — the stream only ever
  * holds one micro-batch of payloads. foreachBatch (not a
  * stream-static join) for the same reason as the fuzzy tier: the
  * probe decision aggregates over band candidates, and per-batch
  * probing keeps the pipeline append-only while the growing index
  * serializes batches. */
object MediaStream {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType)))

  def readMedia(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(mediaSchema).parquet(dir)

  /** Streaming media intake against a GROWING fingerprint index:
    * per micro-batch — perceptual aHash through the real decodes
    * (undecodable payloads screen out), drop items with a
    * Hamming-near-dup already admitted, collapse within-batch dups,
    * append survivors to the index, write admitted (media_id, sig)
    * rows. Returns the started query; callers own termination
    * (checkpoint = `outPath + "/_checkpoint"`). */
  def intakeAndGrowFingerprintIndex(spark: SparkSession, media: DataFrame,
      indexPath: String, outPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sigs = Multimodal.imageAHash(spark, batch.toDF())
        val (survivors, _, _) =
          Dedup.hammingIntakeStep(spark, sigs, indexPath)
        survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(s"$outPath/admitted")
        ()
      }
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .start()
}
