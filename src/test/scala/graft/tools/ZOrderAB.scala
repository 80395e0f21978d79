package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** ON-DISK measurement of the z-order layout win — the physical
  * counterpart to the x122 bucket-stat model: write the SAME rows to
  * parquet twice (single-key range-clustered vs Morton-clustered),
  * run the same two-dimensional box aggregation on both, and compare
  * floors. Parquet row-group pruning reads footer min/max per column:
  * the linear layout prunes only its sort key (the second dimension's
  * per-file range is the whole domain), the z layout prunes both.
  *
  *   sbt "Test/runMain graft.tools.ZOrderAB"
  */
object ZOrderAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_zorder_ab"
    val parts = 64 // files per layout: enough row-group granularity to prune

    val base = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("px", col("l_partkey") % 4096)
      .withColumn("py", col("l_suppkey") % 4096)
    base.repartitionByRange(parts, col("px"))
      .sortWithinPartitions("px")
      .write.mode("overwrite").parquet(s"$root/linear")
    ZOrder.cluster(base, col("px"), col("py"), parts)
      .write.mode("overwrite").parquet(s"$root/zorder")

    def floor(path: String): (Double, Long) = {
      var rows = 0L
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        rows = spark.read.parquet(path)
          .where(col("px").between(512, 1023) &&
            col("py").between(512, 1023))
          .agg(sum("l_quantity").cast("long")).collect()(0).getLong(0)
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, rows)
    }
    val (tl, rl) = floor(s"$root/linear")
    val (tz, rz) = floor(s"$root/zorder")
    require(rl == rz, s"layouts must agree on the result: $rl != $rz")
    Console.err.println(
      f"[zorder] box agg on ${parts} files: linear $tl%.3f s, " +
        f"zorder $tz%.3f s (${tl / tz}%.2fx), identical result $rl")
  }
}
