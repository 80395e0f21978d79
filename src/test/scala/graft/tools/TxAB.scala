package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TxLog

/** Commit-throughput evidence for the TxLog layer: wall-clock to land
  * N appends at 1 / 4 / 8 concurrent writers against one table, plus
  * the single-append latency split (parquet data write + stats
  * read-back vs the atomic manifest claim). The claim is metadata
  * work — the point is to show commit overhead stays milliseconds
  * while the data write dominates, and that contention costs retries,
  * not correctness.
  *
  *   sbt "Test/runMain graft.tools.TxAB"
  */
object TxAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def freshRoot() = java.nio.file.Files
      .createTempDirectory("graft_txab").toString + "/t"
    val rows = (0 until 1000).map(i => (i.toLong, s"payload-$i"))
      .toDF("id", "text")
    rows.count() // session warmup

    // single-append latency split, min-of-5 on a fresh table each
    val splits = (1 to 5).map { _ =>
      val root = freshRoot()
      val t0 = System.nanoTime()
      rows.write.parquet(s"$root/data/probe") // the data-write share
      val t1 = System.nanoTime()
      TxLog.append(spark, root, rows, Some("id")) // write + stats + claim
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e3, (t2 - t1) / 1e3)
    }
    val dataUs = splits.map(_._1).min
    val commitUs = splits.map(_._2).min
    println(f"[txab] bare data write        ${dataUs / 1000}%8.1f ms (min of 5)")
    println(f"[txab] full append (w+stats+claim) ${commitUs / 1000}%8.1f ms (min of 5)")
    println(f"[txab] commit overhead       ${(commitUs - dataUs) / 1000}%8.1f ms (in-write observed stats + manifest claim)")

    // N appends at k concurrent writers, one table per k
    val perWriter = 8
    Seq(1, 4, 8).foreach { k =>
      val root = freshRoot()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(k)
      val t0 = System.nanoTime()
      try {
        val fs = (0 until k).map { w =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = (0 until perWriter).foreach { b =>
              TxLog.append(spark, root,
                rows.where(col("id") % k === w), Some("id"))
            }
          })
        }
        fs.foreach(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = k * perWriter
      assert(TxLog.latestVersion(spark, root) == n,
        s"expected $n contiguous versions")
      println(f"[txab] $k%d writer(s) x $perWriter appends: $sec%7.3f s  " +
        f"(${n / sec}%5.1f commits/s, versions contiguous)")
    }
    spark.stop()
  }
}
