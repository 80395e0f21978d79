package graft

import graft.operators.Compaction

/** READER-ATOMIC pointered tables (VERDICT r9 item 5): the
  * `_current`-manifest layout must give a concurrent, lease-free
  * reader a COMPLETE table at every instant of a replacement — the
  * two-rename `replaceTable` swap had a window (between park and
  * promote) where the live path did not exist. These tests interleave
  * reads at every step of the swap, hammer it from a concurrent
  * thread, and pin the migration + crash-orphan contracts. */
class AtomicSwapSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeRows(dir: String, n: Int): Unit =
    (1 to n).toDF("v").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)

  test("a read at EVERY swap step sees exactly the old or the new table") {
    val root = tmpDir("graft_swap_steps") + "/t"
    // found the table: gen-1 with 10 rows
    writeRows(Compaction.ensureAtomic(spark, root), 10)
    assert(Compaction.readData(spark, root).count() === 10)

    // step 1: DURING the next generation's write (complete gen-2
    // already on disk, pointer not yet flipped) a reader still
    // resolves the OLD generation
    var seenDuringWrite = -1L
    Compaction.replaceTableAtomic(spark, root) { next =>
      writeRows(next, 20)
      seenDuringWrite = Compaction.readData(spark, root).count()
    }
    assert(seenDuringWrite === 10,
      "reader during the new generation's write must see the old table")
    // step 2: after the flip the reader sees the NEW table
    assert(Compaction.readData(spark, root).count() === 20)
    // grace contract: the previous generation survives one swap (a
    // reader that resolved just before the flip can still finish)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-1")))
    // step 3: the default grace keeps TWO generations behind the
    // live one (a reader may straddle two back-to-back swaps), so
    // gen-1 survives the swap to gen-3...
    Compaction.replaceTableAtomic(spark, root)(writeRows(_, 30))
    assert(Compaction.readData(spark, root).count() === 30)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-1")))
    // ...and dies on the swap to gen-4, with gen-2/gen-3 the grace
    Compaction.replaceTableAtomic(spark, root)(writeRows(_, 40))
    assert(Compaction.readData(spark, root).count() === 40)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "gen-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-3")))
    // graceGens=1 restores the tighter single-grace policy
    Compaction.replaceTableAtomic(spark, root, graceGens = 1)(
      writeRows(_, 50))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "gen-2")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "gen-3")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-4")))
  }

  test("a hammering concurrent reader never sees a missing or partial table") {
    val root = tmpDir("graft_swap_hammer") + "/t"
    writeRows(Compaction.ensureAtomic(spark, root), 100)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val n = Compaction.readData(spark, root).count()
          reads.incrementAndGet()
          // every generation is written complete: only the exact row
          // counts of some generation may ever be observed
          if (n % 100 != 0 || n < 100 || n > 600)
            bad.compareAndSet(null, s"saw count $n")
        } catch {
          case e: Exception =>
            bad.compareAndSet(null, s"read failed: ${e.getMessage}")
        }
      }
    })
    reader.start()
    // five swaps under the running reader
    (2 to 6).foreach { i =>
      Compaction.replaceTableAtomic(spark, root)(writeRows(_, i * 100))
    }
    stop.set(true); reader.join(30000)
    assert(bad.get() === null, s"reader observed a broken table: ${bad.get()}")
    assert(reads.get() > 0, "the reader thread must actually have read")
    assert(Compaction.readData(spark, root).count() === 600)
  }

  test("a plain table migrates in place; appends land in the current generation") {
    val root = tmpDir("graft_swap_migrate") + "/t"
    writeRows(root, 7) // plain layout: data files directly at root
    assert(Compaction.resolveData(spark, root) === root) // no pointer yet
    val dataDir = Compaction.ensureAtomic(spark, root)
    assert(dataDir.endsWith("/gen-1"))
    assert(Compaction.readData(spark, root).count() === 7,
      "migration must move the plain files into gen-1 intact")
    // appends go into the CURRENT generation and are immediately visible
    Seq(100, 101).toDF("v").write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(Compaction.ensureAtomic(spark, root))
    assert(Compaction.readData(spark, root).count() === 9)
  }

  test("compactTableAtomic: many appended files become one, content intact, reader-atomic") {
    val root = tmpDir("graft_swap_compact") + "/t"
    // simulate an intake sink: many small appends into the current gen
    (1 to 6).foreach { i =>
      Seq(i * 10, i * 10 + 1).toDF("v").write
        .mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(Compaction.ensureAtomic(spark, root))
    }
    val beforeRows = Compaction.readData(spark, root)
      .as[Int].collect().sorted.toSeq
    val (before, after) = Compaction.compactTableAtomic(spark, root)
    assert(before > after && after == 1,
      s"compaction must shrink $before files to 1, got $after")
    val afterRows = Compaction.readData(spark, root)
      .as[Int].collect().sorted.toSeq
    assert(afterRows == beforeRows, "compaction must not change content")
    // a plain table refuses (its swap would need a reader quiesce)
    val plain = tmpDir("graft_swap_plain") + "/t"
    writeRows(plain, 3)
    intercept[IllegalArgumentException] {
      Compaction.compactTableAtomic(spark, plain)
    }
  }

  test("RunGc reports and (applied) deletes aged orphan generations; grace copy untouched") {
    val root = tmpDir("graft_swap_gc")
    val t = s"$root/t"
    writeRows(Compaction.ensureAtomic(spark, t), 5)
    Compaction.replaceTableAtomic(spark, t)(writeRows(_, 6)) // gen-2 live, gen-1 grace
    writeRows(s"$t/gen-9", 99) // crashed writer's orphan
    // young orphans are skipped (possibly in-flight), then an aged
    // pass deletes them; current + grace generations never surface
    val young = graft.pipeline.RunGc.run(spark, root, ageMinutes = 60,
      apply = true)
    assert(young.exists(f => f.kind == "orphan-generation" &&
      f.path.endsWith("gen-9") && f.action == "skipped-young"))
    val aged = graft.pipeline.RunGc.run(spark, root, ageMinutes = 0,
      apply = true)
    assert(aged.exists(f => f.kind == "orphan-generation" &&
      f.path.endsWith("gen-9") && f.action == "deleted"))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t, "gen-9")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, "gen-1")) &&
      fs.exists(new org.apache.hadoop.fs.Path(t, "gen-2")),
      "live + grace generations must survive gc")
    assert(Compaction.readData(spark, t).count() === 6)
  }

  test("RunGc: non-numeric pointer protects its live gen; aged _current.tmp remnants are swept") {
    val root = tmpDir("graft_swap_gc2")
    val t = s"$root/t"
    writeRows(Compaction.ensureAtomic(spark, t), 5)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // corrupt the pointer to a non-numeric generation name and move
    // the data under it: GC must protect exactly the named directory
    fs.rename(new org.apache.hadoop.fs.Path(t, "gen-1"),
      new org.apache.hadoop.fs.Path(t, "gen-abc"))
    val out = fs.create(new org.apache.hadoop.fs.Path(t, "_current"), true)
    try out.write("gen-abc".getBytes("UTF-8")) finally out.close()
    // plus a crashed flip's tmp manifest — dead weight forever
    val tmp = fs.create(
      new org.apache.hadoop.fs.Path(t, "_current.tmp.deadbeef"), true)
    try tmp.write("gen-2".getBytes("UTF-8")) finally tmp.close()
    val aged = graft.pipeline.RunGc.run(spark, root, ageMinutes = 0,
      apply = true)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, "gen-abc")),
      "the generation a non-numeric pointer names must survive gc")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t, "_current.tmp.deadbeef")),
      "aged crashed-flip tmp manifests must be swept")
    assert(aged.exists(f => f.path.endsWith("_current.tmp.deadbeef") &&
      f.action == "deleted"))
    assert(Compaction.readData(spark, t).count() === 5,
      "the live table must still read through the corrupt-but-valid pointer")
  }

  test("a crashed writer's orphan generation is invisible and gets replaced") {
    val root = tmpDir("graft_swap_orphan") + "/t"
    writeRows(Compaction.ensureAtomic(spark, root), 5)
    // simulate a writer that died after writing gen-2 but BEFORE the
    // pointer flip: the orphan must be invisible to readers
    writeRows(s"$root/gen-2", 99)
    assert(Compaction.readData(spark, root).count() === 5)
    // the next swap clears the orphan and commits its own gen-2
    Compaction.replaceTableAtomic(spark, root)(writeRows(_, 11))
    assert(Compaction.readData(spark, root).count() === 11)
  }
}
