package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** A/B for the x44 first-occurrence pick (dev loop, test scope, never
  * shipped): `dedupChunksKeepFirst`'s min-of-struct hash aggregate vs
  * the window reconstruction (`row_number() OVER (PARTITION BY
  * chunk_text ...)` = 1) — the q06 lesson applied to chunk dedup.
  * The window form must first SORT every corpus chunk within its
  * fingerprint partition; the agg form folds each partition's
  * candidates into one (doc_id, chunk_idx) struct map-side and
  * shuffles only the fold. Results asserted value-identical.
  *
  * Run:  sbt "Test/runMain graft.tools.X44AB"
  * Same-session comparisons only (host steal; see BASELINE.md).
  */
object X44AB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)

    def time[A](name: String, reps: Int)(f: => A): A = {
      var last: A = null.asInstanceOf[A]
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
      }
      Console.err.println(f"[ab] $name%-38s best ${ts.min}%7.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
      last
    }

    def windowForm: DataFrame = {
      val chunks = TextAnalysis.chunkDocs(docs, "doc_id", "text", 3, 3)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk_text")
        .orderBy(col("doc_id").asc, col("chunk_idx").asc)
      chunks.withColumn("__rk", row_number().over(w))
        .where(col("__rk") === 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
            s => s.getField("chunk_text"))).as("text_deduped"))
    }

    val winN = time("x44 keep-first, window form (old)", 3) {
      windowForm.count()
    }
    val aggN = time("x44 keep-first, min-of-struct agg", 3) {
      Dedup.dedupChunksKeepFirst(docs, "doc_id", "text", chunkTokens = 3).count()
    }
    require(winN == aggN, s"row count mismatch: window=$winN agg=$aggN")
    val mismatch = windowForm.exceptAll(
      Dedup.dedupChunksKeepFirst(docs, "doc_id", "text", chunkTokens = 3)).count()
    require(mismatch == 0, s"$mismatch rows differ between forms")
    Console.err.println(s"[ab] results identical ($aggN docs)")
    spark.stop()
  }
}
