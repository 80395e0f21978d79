package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the K7 round-trip hash mismatch on the full
  * pipeline gold: serve gold to Derby, read it back, and print the
  * rows whose string renderings differ (both directions).
  *
  *   sbt "Test/runMain graft.tools.JdbcProbe"
  */
object JdbcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = new java.io.File("/root/reference/test_files").listFiles()
      .map(_.getPath).filter(_.endsWith(".csv")).sorted.toSeq
    val gated = graft.pipeline.AirQuality.filesPassingHeaderGate(spark, files)
    val gold = graft.pipeline.AirQuality.runPipeline(spark, gated)
    val url = "jdbc:derby:memory:probe;create=true"
    graft.pipeline.RunPipeline.serveJdbc(gold, url)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "curated").load()
    println("gold schema: " + gold.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    println("back schema: " + back.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    def strs(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toIndexedSeq.map(c =>
        coalesce(col(c).cast("string"), lit("<null>")).as(c))
      df.select(cols: _*)
    }
    val g = strs(gold); val b = strs(back)
    println("== in gold, not in back ==")
    g.exceptAll(b).show(5, false)
    println("== in back, not in gold ==")
    b.exceptAll(g).show(5, false)
    spark.stop()
  }
}
