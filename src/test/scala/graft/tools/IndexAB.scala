package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Measurement for the r7 persisted-index story ("measure, don't
  * guess"): how much does a small batch's dedup cost when the corpus
  * side is RECOMPUTED per batch (the x20/x03 shapes) vs PROBED from a
  * persisted shard-pruned index (x50 exact / x41+x46 fuzzy)? Corpus =
  * the sf0.1 documents table minus a 100-doc tail; batch = that tail.
  * min-of-5 in one session (the X03AB noise protocol). Build costs are
  * timed once, separately — they amortize over every future batch.
  *
  *   sbt "Test/runMain graft.tools.IndexAB"
  */
object IndexAB {
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
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val corpus = docs.where(col("doc_id") <= maxId - 100)
    val batch = docs.where(col("doc_id") > maxId - 100)
    Console.err.println(s"[indexab] corpus=${corpus.count()} batch=${batch.count()} ($d)")

    def time(name: String, reps: Int = 5)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      Dedup.releaseCheckpoints()
      val best = ts.map(_._1).min
      Console.err.println(f"[indexab] $name%-34s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft_indexab").toString

    // ---- exact tier ----
    time("exact build (once, amortized)", reps = 1) {
      Dedup.buildExactIndex(corpus, "doc_id", col("text"), s"$tmp/exact"); 1L
    }
    time("exact recompute (x20 shape)") {
      Dedup.incrementalSurvivors(corpus, batch, col("text")).count()
    }
    time("exact index probe (x50 shape)") {
      val dups = Dedup.probeExactIndex(spark, s"$tmp/exact", batch,
        "doc_id", col("text")).select(col("in_id").as("doc_id")).distinct()
      batch.join(dups, Seq("doc_id"), "left_anti").count()
    }

    // ---- exact tier, 10x corpus: the crossover demonstration ----
    // recompute scales with the CORPUS (re-digest everything per
    // batch); the probe scales with the BATCH (fixed small-job floor +
    // pruned shard reads). 10 distinct-text copies of the corpus make
    // that visible in one session without touching the fuzzy
    // semantics (digests stay unique per copy).
    val corpus10 = (0 until 10).map { k =>
      corpus.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
        .withColumn("text", concat(col("text"), lit(s" copyvariant$k")))
    }.reduce(_ unionByName _)
    time("exact 10x build (once)", reps = 1) {
      Dedup.buildExactIndex(corpus10, "doc_id", col("text"), s"$tmp/exact10"); 1L
    }
    time("exact 10x recompute (x20 shape)") {
      Dedup.incrementalSurvivors(corpus10, batch, col("text")).count()
    }
    time("exact 10x index probe (x50 shape)") {
      val dups = Dedup.probeExactIndex(spark, s"$tmp/exact10", batch,
        "doc_id", col("text")).select(col("in_id").as("doc_id")).distinct()
      batch.join(dups, Seq("doc_id"), "left_anti").count()
    }

    // ---- fuzzy tier ----
    time("fuzzy build (once, amortized)", reps = 1) {
      Dedup.buildFuzzyIndex(corpus, "doc_id", "text", s"$tmp/fuzzy",
        shingleN = 3, k = 64, bands = 16); 1L
    }
    time("fuzzy re-sign (x03-vs-corpus shape)") {
      // the no-index alternative: sign corpus ∪ batch and keep cross
      // pairs — what every batch would pay without the lake index
      Dedup.minHashDupPairs(corpus.unionByName(batch), "doc_id", "text",
          3, 64, 16, 0.5)
        .where(col("id_b") > maxId - 100).count()
    }
    time("fuzzy index probe (x41 shape)") {
      Dedup.probeFuzzyIndex(spark, s"$tmp/fuzzy", batch,
        "doc_id", "text", threshold = 0.5).count()
    }

    // ---- INTAKE CADENCE SWEEP (r8 verdict item 7): probe cost vs
    // batch size. The probe floor is dominated by fixed per-batch
    // cost (shard collects, pruned listing, small-job dispatch), so
    // the operating question for a delivery cadence is: how large
    // must a coalesced batch be before the fixed cost amortizes?
    // Sweep batch sizes on both tiers; report sec and ms/doc.
    val cadence = Seq(25, 100, 400, 1600)
    val maxBatch = cadence.max
    val corpusC = docs.where(col("doc_id") <= maxId - maxBatch)
    time("cadence exact build (once)", reps = 1) {
      Dedup.buildExactIndex(corpusC, "doc_id", col("text"),
        s"$tmp/exactc"); 1L
    }
    time("cadence fuzzy build (once)", reps = 1) {
      Dedup.buildFuzzyIndex(corpusC, "doc_id", "text", s"$tmp/fuzzyc",
        shingleN = 3, k = 64, bands = 16); 1L
    }
    cadence.foreach { n =>
      val b = docs.where(col("doc_id") > maxId - n)
      val tE = time(f"cadence exact probe, batch=$n%5d") {
        Dedup.probeExactIndex(spark, s"$tmp/exactc", b,
          "doc_id", col("text")).count()
      }
      val tF = time(f"cadence fuzzy probe, batch=$n%5d") {
        Dedup.probeFuzzyIndex(spark, s"$tmp/fuzzyc", b,
          "doc_id", "text", threshold = 0.5).count()
      }
      Console.err.println(f"[indexab] cadence batch=$n%5d  " +
        f"exact ${tE * 1000 / n}%8.2f ms/doc   fuzzy ${tF * 1000 / n}%8.2f ms/doc")
    }

    spark.stop()
  }
}
