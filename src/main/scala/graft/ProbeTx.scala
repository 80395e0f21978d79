package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TxLog
// throwaway probe — never committed
object ProbeTx {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.TxSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 4).foreach { rep =>
      println(s"--- rep $rep ---")
      val t0 = System.nanoTime()
      val root = CatalogShared.freshTxRoot(spark, "smerge", sfDir)
      val key = (id: Column) => concat(lit("doc-"), lpad(id.cast("string"), 6, "0"))
      val doc = CatalogShared.txDocs(spark, sfDir)
        .select(key(col("doc_id")).as("doc_key"), col("text"))
      phase("append")(TxLog.append(spark, root, doc, Some("doc_key")))
      phase("optimizeHash")(TxLog.optimizeHash(spark, root, "doc_key", buckets = 16))
      val base = CatalogShared.txDocs(spark, sfDir)
      val batch = base.where(col("doc_id") % 10 === 3)
          .select(key(col("doc_id")).as("doc_key"), upper(col("text")).as("text"), lit(false).as("__del"))
        .unionByName(base.where(col("doc_id") % 10 === 7)
          .select(key(col("doc_id")).as("doc_key"), col("text"), lit(true).as("__del")))
        .unionByName(base.where(col("doc_id") % 10 === 1)
          .select(key(col("doc_id") + 10000L).as("doc_key"), col("text"), lit(false).as("__del")))
      phase("merge")(TxLog.merge(spark, root, batch, "doc_key", deleteCol = Some("__del")))
      phase("snap+count")(TxLog.snapshot(spark, root)
        .select(col("doc_key"), md5(col("text")).as("digest")).orderBy("doc_key").count())
      println(f"REP TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
