package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis

/** In-session A/B for the x10 quality path (VERDICT r4 item 2 follow-up):
  * measures the remaining interpreted-HOF candidates in the text
  * scoring chain against codegen'd alternatives, asserting identical
  * results. Run:
  *
  *   sbt "Test/runMain graft.tools.QualityAB"
  *
  * Measured (sf0.1, local[32], min-of-5 in-session, r5):
  *  - tokens: split-only 0.306 s vs filter-HOF 0.311 s — equal + the
  *    split form removes the interpreted lambda, adopted;
  *  - stopword hits: the array_remove "codegen" form (10 passes/lang)
  *    measured 0.399 s vs 0.318 s for the single filter-HOF pass —
  *    REJECTED; one interpreted pass beats ten codegen'd allocating
  *    passes, so [[TextAnalysis.stopwordHits]] keeps the HOF;
  *  - x10 end-to-end after the avgLen codegen fix: 0.768 s min.
  */
object QualityAB {
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
    docs.count()

    def time(name: String, reps: Int = 5)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      Console.err.println(f"[qab] $name%-34s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    // ---- tokens: filter-HOF form vs split-only form ----
    def hofTokens(c: Column): Column =
      filter(split(TextAnalysis.normalizeText(c), " "), t => t =!= "")
    val mismT = docs.select(
        hofTokens(col("text")).as("a"), TextAnalysis.tokens(col("text")).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    Console.err.println(s"[qab] token mismatches (HOF vs split): $mismT")
    time("tokens HOF filter") {
      docs.select(size(hofTokens(col("text"))).as("n")).agg(sum("n")).collect()
      docs.count()
    }
    time("tokens split-only") {
      docs.select(size(TextAnalysis.tokens(col("text"))).as("n")).agg(sum("n")).collect()
      docs.count()
    }

    // ---- stopword hits: filter-HOF vs array_remove difference sums ----
    def removeHits(toks: Column, lang: String): Column = {
      val words = TextAnalysis.stopwords.toMap.apply(lang)
      words.map(w => size(toks) - size(array_remove(toks, w))).reduce(_ + _)
    }
    val toks = TextAnalysis.tokens(col("text"))
    val mismS = docs.select(
        TextAnalysis.stopwordHits(toks, "en").as("a"), removeHits(toks, "en").as("b"))
      .where(col("a") =!= col("b")).count()
    Console.err.println(s"[qab] stopword-hit mismatches (HOF vs remove): $mismS")
    time("stopwords HOF filter (5 langs)") {
      docs.withColumn("__toks", toks)
        .select(TextAnalysis.stopwords.map { case (l, _) =>
          TextAnalysis.stopwordHits(col("__toks"), l).as(l) }: _*)
        .agg(sum("en")).collect()
      docs.count()
    }
    time("stopwords array_remove (5 langs)") {
      docs.withColumn("__toks", toks)
        .select(TextAnalysis.stopwords.map { case (l, _) =>
          removeHits(col("__toks"), l).as(l) }: _*)
        .agg(sum("en")).collect()
      docs.count()
    }

    // ---- end to end: the full x10 quality query ----
    time("x10 quality full") {
      docs.withColumn("__toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          (floor(TextAnalysis.qualityScoreFromTokens(col("text"), col("__toks"))
            * 10000) / 10000).as("quality"))
        .agg(sum("quality")).collect()
      docs.count()
    }

    spark.stop()
  }
}
