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

    // MERGE cost vs touched-dir count (r13): one table range-clustered
    // into 16 dirs (appendPartitioned), then a fixed-size 100-key
    // batch whose span admits 1 / 4 / 16 dirs — the claim under test
    // is that merge cost scales with TOUCHED dirs, not table size
    // (manifest stats prune the write path). min-of-3 per width.
    val wide = spark.range(0, 1000000L).select(col("id"),
      concat(lit("payload-"), col("id")).as("text"))
    Seq(("1 dir", 0, 100), ("4 dirs", 0, 200000), ("16 dirs", 0, 950000))
      .foreach { case (label, lo, hi) =>
        val times = (1 to 3).map { _ =>
          val root = freshRoot()
          TxLog.appendPartitioned(spark, root, wide, "id", buckets = 16)
          val step = math.max(1, (hi - lo) / 100)
          val batch = (lo until hi by step).take(100)
            .map(i => (i.toLong, s"upd-$i")).toDF("id", "text")
          val t0 = System.nanoTime()
          val v = TxLog.merge(spark, root, batch, "id")
          val sec = (System.nanoTime() - t0) / 1e9
          val touched = TxLog.history(spark, root)
            .where(col("version") === v).head().getAs[Long]("n_removes")
          (sec, touched)
        }
        val best = times.minBy(_._1)
        println(f"[txab] merge 100 keys spanning $label%-7s " +
          f"${best._1}%7.3f s (touched ${best._2}%2d dirs, min of 3)")
      }

    // takedown shapes (r13): 100 keys SCATTERED over every dir — the
    // worst case for a rewrite-based delete (all 16 dirs touched) and
    // the exact case tombstones exist for (a key-file write, no dir
    // touched). Same table, min-of-3 each; the snapshot afterwards
    // proves both paths read identically.
    locally {
      def scattered(root: String) = spark.range(0, 100)
        .select((col("id") * 10000L).as("id"))
      def timed(label: String)(run: String => Unit): Unit = {
        val times = (1 to 3).map { _ =>
          val root = freshRoot()
          TxLog.appendPartitioned(spark, root, wide, "id", buckets = 16)
          val t0 = System.nanoTime()
          run(root)
          val sec = (System.nanoTime() - t0) / 1e9
          assert(TxLog.snapshot(spark, root).count() == 1000000L - 100L)
          sec
        }
        println(f"[txab] takedown 100 scattered keys via $label%-12s " +
          f"${times.min}%7.3f s (min of 3)")
      }
      timed("mergeDelete")(root =>
        TxLog.mergeDelete(spark, root, scattered(root), "id"))
      timed("tombstone")(root =>
        TxLog.tombstone(spark, root, scattered(root), "id"))
    }
    spark.stop()
  }
}
