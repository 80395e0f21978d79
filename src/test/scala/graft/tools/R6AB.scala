package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dedup, Rebalance, TextAnalysis}

/** Round-6 A/B measurements (dev loop, test scope, never shipped):
  *
  *  1. RunCurate composition: the old `curate()` then `report()`
  *     two-funnel composition vs the single-execution
  *     [[Curate.curateAndReport]] — same documents fixture and config
  *     as the CurateSpec end-to-end test, counts asserted equal.
  *  2. Blocked n-gram dedup shingles: the replaced interpreted
  *     string-shingle HOF pipeline vs the codegen'd
  *     [[graft.functions.ShingleHashes]] form now used by
  *     `ngramJaccardPairs` (x04 parameters), pair sets asserted equal.
  *
  * Run:  sbt "Test/runMain graft.tools.R6AB"
  * Same-session comparisons only (host steal; see BASELINE.md).
  */
object R6AB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, d)
    val cfg = Curate.Config(langs = Seq("en", "und"),
      minQuality = 0.0, minTokens = 1)

    def time[A](name: String, reps: Int)(f: => A): A = {
      var last: A = null.asInstanceOf[A]
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
      }
      Console.err.println(f"[ab] $name%-38s best ${ts.min}%7.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
      last
    }

    // ---- 1. curate+report composition vs curateAndReport ----------
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val twoCall = time("curate() then report() (old)", 3) {
      val n = Curate.curate(docs, "doc_id", "text", cfg).count()
      sink.set(n)
      val r = Curate.report(docs, "doc_id", "text", cfg)
      Dedup.releaseCheckpoints()
      r
    }
    val oneCall = time("curateAndReport (single funnel)", 3) {
      val r = Curate.curateAndReport(docs, "doc_id", "text", cfg) {
        s => sink.set(s.count())
      }
      Dedup.releaseCheckpoints()
      r
    }
    require(twoCall == oneCall,
      s"count mismatch: two-call=$twoCall one-call=$oneCall")
    require(oneCall.toMap.apply("kept") == sink.get(),
      "written survivor count must equal the reported kept count")

    // ---- 2. x04-shape shingles: string HOF vs ShingleHashes -------
    // the form ngramJaccardPairs used through r5, reconstructed
    def hofPairs(n: Int, threshold: Double): DataFrame = {
      val blockOn = Seq("lang", "source")
      val base = Rebalance(docs.select(
          (col("doc_id").as("id") +: col("text").as("__text") +: blockOn.map(col)): _*))
        .withColumn("__toks", TextAnalysis.tokens(col("__text")))
        .withColumn("sh", TextAnalysis.shinglesFromTokens(col("__toks"), n))
        .where(size(col("sh")) > 0)
        .select((col("id") +: col("sh") +: blockOn.map(col)): _*)
      val l = base.as("l"); val r = base.as("r")
      val blockCond = blockOn.map(c => col(s"l.$c") === col(s"r.$c"))
        .foldLeft(col("l.id") < col("r.id"))(_ && _)
      l.join(r, blockCond)
        .withColumn("__inter", size(array_intersect(col("l.sh"), col("r.sh"))))
        .withColumn("jaccard", Dedup.jaccardFromIntersect(
          col("__inter"), size(col("l.sh")), size(col("r.sh"))))
        .where(col("jaccard") >= threshold)
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("jaccard"))
    }
    val oldRows = time("x04 pairs, string-shingle HOF (old)", 3) {
      hofPairs(1, 0.5).count()
    }
    val newRows = time("x04 pairs, ShingleHashes (new)", 3) {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 1, threshold = 0.5, blockOn = Seq("lang", "source")).count()
    }
    require(oldRows == newRows, s"pair count mismatch: $oldRows vs $newRows")
    val mismatch = hofPairs(1, 0.5)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .exceptAll(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 1, threshold = 0.5, blockOn = Seq("lang", "source"))
        .withColumn("jaccard", round(col("jaccard"), 4)))
      .count()
    require(mismatch == 0, s"$mismatch pairs differ between forms")
    Console.err.println(s"[ab] pair sets identical ($newRows rows)")
    spark.stop()
  }
}
