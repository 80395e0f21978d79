package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Catalog
import graft.operators.{Rebalance, TextAnalysis}

/** In-session adjudication of the r7 x42 bench floor move (VERDICT r7
  * item 1, the X06AB protocol): the driver's r7 run recorded x42 min
  * 0.761 s vs r6's 0.410 s on code `git diff 3775f98..HEAD` shows
  * untouched (only `corpusProfile` changed in TextAnalysis.scala), and
  * the rep pattern — min==cold 0.761 with warm reps SLOWER (1.228) —
  * is the documented host-steal signature (only rep 1 of that driver
  * run was a clean sample). Protocol: min-of-5 in ONE session for
  *  - x42 full (the catalog query, count-forced like Bench),
  *  - q20 star join (untouched parity control) and x01 exact-dedup
  *    (untouched extension control) from the same driver run,
  *  - x42 decomposed: gram fan-out scan only / frequent-gram df
  *    aggregate only / full boilerplateRate,
  * so a real component regression shows up as a stage floor above the
  * r6 band while host steal shows every number back at its floor.
  *
  *   sbt "Test/runMain graft.tools.X42AB"
  */
object X42AB {
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
    // warmup action (same as Bench)
    spark.read.parquet(s"$d/region.parquet").count()

    def time(name: String, reps: Int = 5)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      graft.operators.Dedup.releaseCheckpoints()
      val best = ts.map(_._1).min
      Console.err.println(f"[x42ab] $name%-28s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    def byName(n: String) = Catalog.entries.find(_.name == n).get

    // ---- the bench query + two untouched controls, as Bench runs them ----
    time("x42 full (catalog)") { byName("x42_boilerplate_rate").build(spark, d).count() }
    time("q20 control (catalog)") { byName("q20_star_join").build(spark, d).count() }
    time("x01 control (catalog)") { byName("x01_dedup_exact").build(spark, d).count() }

    // ---- x42 decomposed (the boilerplateRate stages) ----
    val docs = graft.Tables.documents(spark, d)
    def grams = Rebalance(docs.select(col("doc_id"), col("text").as("__text")))
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes.column(col("__text"), 2)).as("gram"))

    time("gram fan-out scan only") { grams.count() }
    time("frequent-gram df agg only") {
      grams.groupBy("gram").agg(count(lit(1)).as("__df"))
        .where(col("__df") >= 3).count()
    }
    time("full boilerplateRate") {
      TextAnalysis.boilerplateRate(docs, "doc_id", "text", n = 2, minDf = 3)
        .count()
    }

    spark.stop()
  }
}
