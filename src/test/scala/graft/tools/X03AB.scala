package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** In-session A/B for the r4 x03 bench regression (VERDICT r4 item 1):
  * CappedIds vs collect_list in the LSH candidate-pair aggregate,
  * measured min-of-5 in ONE session so host noise can't masquerade as
  * a code regression. Run:
  *
  *   sbt "Test/runMain graft.tools.X03AB"
  *
  * Sections:
  *  - full x03 (current code path), 5 reps
  *  - pair generation only, CappedIds (current) vs collect_list+filter
  *    (the r3 shape), 5 reps each, counts asserted equal
  */
object X03AB {
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
    // warmup action
    docs.count()

    def time(name: String, reps: Int = 5)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      Console.err.println(f"[x03ab] $name%-30s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    // ---- full x03, current code path ----
    time("x03 full (CappedIds)") {
      Dedup.minHashDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }

    // ---- pair generation only, both collect strategies ----
    def banded() = Dedup.lshBandRows(
      Dedup.minHashBaseFromArrays(
        Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64), 64, 16)

    def cappedPairs(): Long =
      banded().groupBy("band", "bucket")
        .agg(graft.functions.CappedIds.column(col("id"), 1000).as("__ids"))
        .where(size(col("__ids")).between(2, 1000))
        .select(explode(graft.functions.SortedPairs.column(col("__ids"))).as("__p"))
        .select(col("__p.id_a"), col("__p.id_b"))
        .distinct().count()

    def collectListPairs(): Long =
      banded().groupBy("band", "bucket")
        .agg(collect_list(col("id")).as("__ids"))
        .where(size(col("__ids")).between(2, 1000))
        .select(explode(graft.functions.SortedPairs.column(col("__ids"))).as("__p"))
        .select(col("__p.id_a"), col("__p.id_b"))
        .distinct().count()

    val a = cappedPairs(); val b = collectListPairs()
    Console.err.println(s"[x03ab] pair counts capped=$a collect_list=$b (must match)")
    time("pairs CappedIds") { cappedPairs() }
    time("pairs collect_list") { collectListPairs() }

    // ---- decompose: where does the time go in the full query? ----
    time("base only (sig agg)") {
      Dedup.minHashBaseFromArrays(
        Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64).count()
    }
    time("banded only") { banded().count() }

    spark.stop()
  }
}
