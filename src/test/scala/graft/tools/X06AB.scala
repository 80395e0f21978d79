package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Catalog, Tables}
import graft.operators.Similarity

/** In-session adjudication of the r6 x06 bench doubling (VERDICT r6
  * item 1, the X03AB precedent): the driver's r6 run recorded x06 min
  * 0.754 s vs r5's 0.376 s on code `git diff` shows untouched, amid a
  * uniform ~1.2-1.4x inflation of every query (the documented
  * host-steal signature). Protocol: min-of-5 in ONE session for
  *  - x06 full (the catalog query, count-forced like Bench),
  *  - q20 star join (untouched parity control, same r6 inflation band),
  *  - x06 decomposed: corpus scan+norm only / scored join only (no
  *    ranking) / ranking tail included,
  * so a real component regression would show up as a stage floor above
  * the r5 band while host steal shows every number back at its floor.
  *
  *   sbt "Test/runMain graft.tools.X06AB"
  */
object X06AB {
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
      Console.err.println(f"[x06ab] $name%-28s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
      best
    }

    def byName(n: String) = Catalog.entries.find(_.name == n).get

    // ---- the two bench queries, exactly as Bench runs them ----
    time("x06 full (catalog)") { byName("x06_knn_cosine").build(spark, d).count() }
    time("q20 control (catalog)") { byName("q20_star_join").build(spark, d).count() }

    // ---- x06 decomposed ----
    val emb = Tables.embeddings(spark, d)
    def queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

    time("corpus scan + norm only") {
      emb.select(col("vec_id"), col("embedding"))
        .withColumn("__cn", Similarity.norm(col("embedding")))
        .where(col("__cn") > lit(-1.0)).count()
    }
    time("scored join, no ranking") {
      val c = emb.select(col("vec_id"), col("embedding"))
        .withColumn("__cn", Similarity.norm(col("embedding")))
      val q = queries.withColumn("__qn", Similarity.norm(col("q_vec")))
      c.join(broadcast(q))
        .where(col("q_id") =!= col("vec_id"))
        .withColumn("cosine", Similarity.cosineWithNorms(
          col("q_vec"), col("embedding"), col("__qn"), col("__cn")))
        .where(col("cosine") > lit(-2.0)).count()
    }
    time("full bruteForceTopK") {
      Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 5).count()
    }

    spark.stop()
  }
}
