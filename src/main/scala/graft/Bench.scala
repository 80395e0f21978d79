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
    def time(q: Catalog.QueryDef): Double = {
      val t0 = System.nanoTime()
      try { q.build(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // free dedup checkpoint blocks between queries so repeated runs
      // in one session (the warm pass) start from flat executor storage
      graft.operators.Dedup.releaseCheckpoints()
      sec
    }
    // pass 1: cold — includes whole-stage-codegen compilation (the
    // r1-comparable headline). pass 2: warm — plan classes cached, the
    // steady-state throughput a long-lived cluster session sees.
    val cold = Catalog.headlines.map { q =>
      val sec = time(q)
      Console.err.println(f"[bench] ${q.name}%-24s $sec%8.3f s")
      q.name -> sec
    }
    val warm = Catalog.headlines.map { q =>
      val sec = time(q)
      Console.err.println(f"[bench] warm ${q.name}%-19s $sec%8.3f s")
      q.name -> sec
    }
    def jmap(m: Seq[(String, Double)]) = m
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val total = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(cold)},"warm_total":$warmTotal%.3f,"warm":${jmap(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
