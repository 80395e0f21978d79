package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Measurement for the r10 bloom negative-cache story ("measure,
  * don't guess"): how much does the exact-index probe cost with vs
  * without the bloom sidecar screen, as a function of the batch's
  * DUPLICATE RATE? The screen's claim is that probe I/O scales with
  * the duplicate rate, not the batch size — so the win should be
  * largest on a fully-novel batch (every digest screened out before
  * any index read) and smallest (possibly negative — the screen is
  * one extra broadcast-sized job) on an all-dup batch. Corpus = 10
  * distinct-text copies of the sf0.1 documents table (the IndexAB
  * 10× construction, so index reads are worth avoiding); batches =
  * 200 docs at 0%, 10%, 50%, 100% duplicate rate. min-of-5 in one
  * session (the X03AB noise protocol).
  *
  *   sbt "Test/runMain graft.tools.BloomAB"
  */
object BloomAB {
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
    val corpus10 = (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
        .withColumn("text", concat(col("text"), lit(s" copyvariant$k")))
    }.reduce(_ unionByName _).cache()
    Console.err.println(s"[bloomab] corpus=${corpus10.count()} ($d ×10)")

    def time(name: String, reps: Int = 5)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      Console.err.println(f"[bloomab] $name%-40s min $best%7.3f s  " +
        f"(${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomab").toString
    time("exact 10x build (once, amortized)", reps = 1) {
      Dedup.buildExactIndex(corpus10, "doc_id", col("text"), s"$tmp/exact"); 1L
    }

    // batches: 200 docs at increasing duplicate rate. Dups reuse
    // corpus texts; novels get text no corpus digest can match.
    def batchAt(dupPct: Int) = {
      val nDup = 200 * dupPct / 100
      val dups = corpus10.orderBy("doc_id").limit(nDup)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      val novel = spark.range(200 - nDup)
        .select((col("id") + 60000000L).as("doc_id"),
          concat(lit("entirely novel content row "), col("id")).as("text"))
      dups.unionByName(novel).cache()
    }

    for (pct <- Seq(0, 10, 50, 100)) {
      val b = batchAt(pct)
      b.count()
      time(f"probe UNSCREENED, dup=$pct%3d%%") {
        Dedup.probeExactIndex(spark, s"$tmp/exact", b, "doc_id", col("text")).count()
      }
    }
    // now grow the sidecar and repeat — probeExactIndex auto-screens
    time("bloom sidecar build (once, amortized)", reps = 1) {
      Dedup.buildExactBloom(spark, s"$tmp/exact"); 1L
    }
    for (pct <- Seq(0, 10, 50, 100)) {
      val b = batchAt(pct)
      b.count()
      time(f"probe BLOOM-SCREENED, dup=$pct%3d%%") {
        Dedup.probeExactIndex(spark, s"$tmp/exact", b, "doc_id", col("text")).count()
      }
    }

    spark.stop()
  }
}
