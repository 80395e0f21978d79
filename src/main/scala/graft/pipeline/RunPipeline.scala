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
  * Stages:
  *  bronze — gated CSV read, filename partition extraction, write
  *           parquet partitioned by (pollutant, file_date);
  *  silver — per-pollutant typed/deduped tables (partition-pruned
  *           reads of the bronze lake);
  *  gold   — prefix/join/impute/convert/total/lag analytics, one
  *           parquet table.
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
    run(spark, all.take(1), s"$outDir/batch1", "1-file")
    run(spark, all, s"$outDir/batchAll", s"${all.size}-file")
    spark.stop()
  }

  def run(spark: SparkSession, csvPaths: Seq[String], outDir: String,
      label: String): Unit = {
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

    val codes = timed("silver") {
      val bronze = spark.read.parquet(s"$outDir/bronze")
      val codes = bronze.select("pollutant").distinct()
        .collect().map(_.getString(0)).sorted
      codes.foreach { code =>
        // partition-pruned scan: the filter hits the pollutant= dir only
        AirQuality.silver(bronze.where(col("pollutant") === code))
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/silver/p$code")
      }
      codes
    }

    timed("gold") {
      val silvers = codes.map { code =>
        val name = "p" + graft.core.Names.normalizeColumnName(code)
        name -> spark.read.parquet(s"$outDir/silver/p$code")
      }.toMap
      AirQuality.gold(silvers)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/gold")
    }

    val n = spark.read.parquet(s"$outDir/gold").count()
    println(s"[pipeline] $label gold rows=$n")
  }
}
