package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, TextAnalysis}

/** Stage-by-stage timing probe for the Curate funnel (dev tool). */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    val cfg = Curate.Config()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      Console.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val clean0 = TextAnalysis.cleanText(col("text"))
    val cleaned = docs.withColumn("__clean", clean0)
    val scored = cleaned
      .withColumn("__stats", TextAnalysis.docStats(col("__clean")))
      .withColumn("__lang", TextAnalysis.langIdFromStats(col("__stats")))
      .withColumn("__quality",
        TextAnalysis.qualityScoreFromStats(col("__clean"), col("__stats")))
      .withColumn("__rep", TextAnalysis.repetitionRatioFromStats(col("__stats")))
      .withColumn("__pass",
        col("__lang").isin(cfg.langs: _*) &&
          col("__stats").getField("n_tokens") >= cfg.minTokens &&
          col("__quality") >= cfg.minQuality &&
          col("__rep") <= cfg.maxRepetition)
    // equivalence vs the HOF forms, before timing
    val hofToks = TextAnalysis.tokens(col("__clean"))
    val mism = cleaned.withColumn("__toks", hofToks)
      .withColumn("__stats", TextAnalysis.docStats(col("__clean")))
      .select(
        TextAnalysis.langIdFromTokens(col("__toks")).as("l1"),
        TextAnalysis.langIdFromStats(col("__stats")).as("l2"),
        TextAnalysis.qualityScoreFromTokens(col("__clean"), col("__toks")).as("q1"),
        TextAnalysis.qualityScoreFromStats(col("__clean"), col("__stats")).as("q2"),
        TextAnalysis.repetitionRatio(col("__toks"), 2).as("r1"),
        TextAnalysis.repetitionRatioFromStats(col("__stats")).as("r2"))
      .where(col("l1") =!= col("l2") || col("q1") =!= col("q2") ||
        col("r1") =!= col("r2")).count()
    Console.err.println(s"[probe] stats-vs-HOF mismatches: $mism")
    time("scored") { scored.count() }
    val filtered = scored.where(col("__pass"))
    time("filtered") { filtered.count() }
    val exact = Dedup.exactSurvivors(filtered, "doc_id",
      TextAnalysis.fingerprint(col("__clean")))
    time("exact") { exact.count() }
    time("exact again") { exact.count() }
    val pairs = Dedup.minHashDupPairs(exact, "doc_id", "__clean",
      cfg.shingleN, cfg.minhashK, cfg.bands, cfg.jaccardThreshold)
    time("pairs") { pairs.count() }
    val labels = Dedup.dupClusters(pairs)
    time("labels (post-dupClusters)") { labels.count() }
    val fuzzyDrop = labels.where(col("label") =!= col("id"))
      .select(col("id").as("doc_id"))
    val fuzzy = exact.join(fuzzyDrop, Seq("doc_id"), "left_anti")
    time("fuzzy") { fuzzy.count() }
    time("full curate()") { Curate.curate(docs, "doc_id", "text").count() }
    spark.stop()
  }
}
