package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end medallion run over the reference's CSV corpus, with the
  * reference's own measurement protocol (time each stage; compare a
  * 1-file batch against the full batch — reference:
  * src/main.py:111-116, stage timers in the four stage scripts).
  *
  * Usage: runMain graft.pipeline.RunPipeline [csvDir] [outDir]
  * Defaults: /root/reference/test_files -> /tmp/graft_pipeline.
  *
  * Env knobs:
  *  - SPARK_GRAFT_POLLUTANTS: path to a pollutants config in the
  *    reference's `config/pollutants.yaml` shape; default is the
  *    built-in [[Pollutants.default]] dimension. The silver fan-out
  *    processes only configured pollutants (comment-out toggle).
  *  - SPARK_GRAFT_JDBC_URL (+ optional SPARK_GRAFT_JDBC_DRIVER): when
  *    set, the gold table is ALSO served to this JDBC target as table
  *    `curated`, overwrite mode — the reference's PostgreSQL serving
  *    sink (`src/process_to_curated.py:189-198`, called at `:271` with
  *    `if_exists='replace'`). E.g.
  *    `jdbc:derby:memory:curated;create=true` for a local smoke run.
  *
  * Stages:
  *  bronze — gated CSV read, filename partition extraction, write
  *           parquet partitioned by (pollutant, file_date);
  *  silver — per-configured-pollutant typed/deduped tables
  *           (partition-pruned reads of the bronze lake), named by
  *           normalized short name like the reference's;
  *  gold   — prefix/join/impute/convert/total/lag analytics, one
  *           parquet table (+ optional JDBC serve).
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    val csvDir = args.headOption.getOrElse("/root/reference/test_files")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_pipeline")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // keep pollutant codes as zero-padded strings ("01", not 1)
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = new java.io.File(csvDir).listFiles()
      .map(_.getPath).filter(_.endsWith(".csv")).sorted.toSeq
    val pollutants = sys.env.get("SPARK_GRAFT_POLLUTANTS")
      .map(Pollutants.load).getOrElse(Pollutants.default)
    run(spark, all.take(1), s"$outDir/batch1", "1-file", pollutants)
    run(spark, all, s"$outDir/batchAll", s"${all.size}-file", pollutants)
    spark.stop()
  }

  def run(spark: SparkSession, csvPaths: Seq[String], outDir: String,
      label: String, pollutants: Seq[Pollutant] = Pollutants.default): Unit = {
    def timed[A](stage: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipeline] $label%-8s $stage%-7s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val gated = AirQuality.filesPassingHeaderGate(spark, csvPaths)

    timed("bronze") {
      AirQuality.withPartitionColumnsFromFilename(
          AirQuality.readBronzeCsv(spark, gated))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("pollutant", "file_date")
        .parquet(s"$outDir/bronze")
    }

    val active = timed("silver") {
      val bronze = spark.read.parquet(s"$outDir/bronze")
      // tiny dimension-sized collect: which configured codes have data
      val present = bronze.select("pollutant").distinct()
        .collect().map(_.getString(0)).toSet
      val active = pollutants.filter(p => present(p.code))
      present.diff(active.map(_.code).toSet).toSeq.sorted.foreach { c =>
        println(s"[pipeline] $label skipping unconfigured pollutant code $c")
      }
      active.foreach { p =>
        // partition-pruned scan: the filter hits the pollutant= dir only
        AirQuality.silver(bronze.where(col("pollutant") === p.code))
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/silver/${p.tableName}")
      }
      active
    }

    timed("gold") {
      val silvers = active.map { p =>
        p.tableName -> spark.read.parquet(s"$outDir/silver/${p.tableName}")
      }.toMap
      AirQuality.gold(silvers)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/gold")
    }

    val gold = spark.read.parquet(s"$outDir/gold")
    // K7: serve gold to the configured JDBC target (the reference's
    // PostgreSQL step — table "curated", replace semantics)
    sys.env.get("SPARK_GRAFT_JDBC_URL").foreach { url =>
      timed("jdbc") { serveJdbc(gold, url, sys.env.get("SPARK_GRAFT_JDBC_DRIVER")) }
    }
    val n = gold.count()
    println(s"[pipeline] $label gold rows=$n")
  }

  /** K7 serving sink: overwrite-write a gold frame to `curated` on a
    * JDBC target (reference: `src/process_to_curated.py:189-198` —
    * `to_sql(..., if_exists='replace')` into PostgreSQL). Partition
    * writes stream in parallel, one connection per task; at warehouse
    * scale, size `df.rdd.getNumPartitions` to what the database can
    * absorb (`coalesce` before calling if the target is small). */
  def serveJdbc(df: org.apache.spark.sql.DataFrame, url: String,
      driver: Option[String] = None, table: String = "curated"): Unit = {
    val props = new java.util.Properties()
    driver.foreach(props.setProperty("driver", _))
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }
}
