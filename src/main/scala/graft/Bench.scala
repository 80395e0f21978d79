package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Catalog.headlines) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is forced
  * with count() (full plan execution, no result collection cost). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one cheap action to absorb session/codegen warmup noise
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = Catalog.headlines.map { q =>
      val t0 = System.nanoTime()
      try { q.build(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      Console.err.println(f"[bench] ${q.name}%-24s $sec%8.3f s")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
