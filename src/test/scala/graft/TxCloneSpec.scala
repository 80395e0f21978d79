package graft

import graft.operators.TxLog
import org.apache.spark.sql.functions._

/** ZERO-COPY SHALLOW CLONE ([[TxLog.cloneTable]]): forking a table is
  * a metadata operation — the manifest log copies, data dirs stay
  * where they are, and readers resolve each dir against the clone
  * chain by its add generation. Pins the fork contract: identical
  * reads at the cut, divergence in BOTH directions after it, pre-fork
  * time travel and CDC from inside the clone, merge/tombstone/restore
  * riding the chain, nested clones, vacuum locality (a clone's vacuum
  * can never reach base-resident dirs), and localization via a
  * table-sized rewrite. */
class TxCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txc_$tag").toString + "/t"

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"doc-$i")).toDF("id", "text")

  private def localData(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/data")
    if (!d.exists()) Seq.empty else d.list().toSeq.sorted
  }

  test("cloneTable: the fork is zero-copy — no local data dirs, identical " +
      "reads at the cut, divergence in both directions after it") {
    val src = freshRoot("src")
    TxLog.append(spark, src, docs(0, 100), Some("id"))
    TxLog.append(spark, src, docs(100, 200), Some("id"))
    TxLog.tombstone(spark, src, Seq(5L).toDF("id"), "id")
    TxLog.addConstraint(spark, src, "pos", "id >= 0")
    val dst = freshRoot("dst")
    val cut = TxLog.cloneTable(spark, src, dst)
    assert(cut === 5L)
    // ZERO data bytes moved: the clone has no local data at all
    assert(localData(dst).isEmpty)
    assert(TxLog.snapshot(spark, dst).count() === 199)
    assert(TxLog.snapshot(spark, dst).agg(sum("id")).head().getLong(0) ===
      TxLog.snapshot(spark, src).agg(sum("id")).head().getLong(0))
    // contract forks with the data: constraint enforced in the clone
    intercept[TxLog.TxConstraintException] {
      TxLog.append(spark, dst, Seq((-1L, "bad")).toDF("id", "text"),
        Some("id"))
    }
    // divergence: a clone append is invisible to the source...
    TxLog.append(spark, dst, docs(200, 210), Some("id"))
    assert(TxLog.snapshot(spark, dst).count() === 209)
    assert(TxLog.snapshot(spark, src).count() === 199)
    assert(localData(dst).size === 1, "only the new append is local")
    // ...and a post-fork source append is invisible to the clone
    TxLog.append(spark, src, docs(900, 910), Some("id"))
    assert(TxLog.snapshot(spark, dst).count() === 209)
    // PRE-FORK history travels from inside the clone (the full log
    // forked, not just the head state)
    assert(TxLog.snapshot(spark, dst, Some(1L)).count() === 100)
    assert(TxLog.snapshot(spark, dst, Some(2L)).count() === 200)
    assert(TxLog.history(spark, dst)
      .where(col("action") === "clone").count() === 1)
    // CDC across the fork: the full-window replay reads pre-fork dirs
    val cdc = TxLog.changes(spark, dst, 0L, cut)
    assert(cdc.where(col("__change") === "insert").count() === 200)
  }

  test("merge, tombstone and restore ride the fork: pre-fork dirs " +
      "materialize locally, the source never changes") {
    val src = freshRoot("msrc")
    (0 until 4).foreach(k =>
      TxLog.append(spark, src, docs(k * 100, k * 100 + 100), Some("id")))
    val dst = freshRoot("mdst")
    val cut = TxLog.cloneTable(spark, src, dst)
    // merge updates a pre-fork key: the touched BASE dir rewrites into
    // the clone's own storage, everything else stays zero-copy
    TxLog.merge(spark, dst, Seq((150L, "updated")).toDF("id", "text"), "id")
    assert(TxLog.snapshot(spark, dst).where(col("id") === 150L)
      .select("text").as[String].head() === "updated")
    assert(TxLog.snapshot(spark, src).where(col("id") === 150L)
      .select("text").as[String].head() === "doc-150")
    assert(localData(dst).nonEmpty)
    // tombstone masks a pre-fork key in the clone only
    TxLog.tombstone(spark, dst, Seq(42L).toDF("id"), "id")
    assert(TxLog.snapshot(spark, dst).where(col("id") === 42L).count() === 0)
    assert(TxLog.snapshot(spark, src).where(col("id") === 42L).count() === 1)
    // restore the clone to the cut: the botch rolls back, the re-added
    // dirs resolve to base again, and the source is still untouched
    TxLog.restore(spark, dst, cut)
    val snap = TxLog.snapshot(spark, dst)
    assert(snap.count() === 400)
    assert(snap.where(col("id") === 150L)
      .select("text").as[String].head() === "doc-150")
    assert(TxLog.snapshot(spark, src).count() === 400)
  }

  test("nested clones resolve through the chain; a table-sized rewrite " +
      "localizes a clone and cuts the base dependency") {
    val s0 = freshRoot("n0")
    TxLog.append(spark, s0, docs(0, 100), Some("id"))
    val a = freshRoot("na")
    TxLog.cloneTable(spark, s0, a)
    TxLog.append(spark, a, docs(100, 150), Some("id")) // local to A
    val b = freshRoot("nb")
    TxLog.cloneTable(spark, a, b)
    // B reads rows living in THREE places: s0 (gen 1), a (gen 3), and
    // after this append, b itself
    TxLog.append(spark, b, docs(150, 160), Some("id"))
    assert(TxLog.snapshot(spark, b).count() === 160)
    assert(TxLog.snapshot(spark, b).agg(sum("id")).head().getLong(0) ===
      (0L until 160L).sum)
    assert(TxLog.snapshot(spark, a).count() === 150)
    assert(TxLog.snapshot(spark, s0).count() === 100)
    // pre-every-fork travel from the deepest clone
    assert(TxLog.snapshot(spark, b, Some(1L)).count() === 100)
    // localize: one optimize makes every live dir B-resident, so a
    // base vacuum can no longer hurt it
    TxLog.optimizeRange(spark, b, "id", buckets = 4)
    val live = TxLog.liveFiles(spark, b)._2
    val cutB = TxLog.history(spark, b)
      .where(col("action") === "clone").agg(max("version"))
      .head().getLong(0)
    assert(live.forall(_.gen > cutB), "all live dirs postdate the fork")
    assert(TxLog.snapshot(spark, b).count() === 160)
    // and the clone's own vacuum never reached into a or s0
    assert(TxLog.snapshot(spark, a).count() === 150)
    assert(TxLog.snapshot(spark, s0).count() === 100)
  }

  test("SOURCE vacuum is clone-safe: registered clones pin the pre-fork " +
      "dirs they read — transitively — and localizing releases the pins") {
    val src = freshRoot("pins")
    TxLog.append(spark, src, docs(0, 100), Some("id"))
    TxLog.append(spark, src, docs(100, 200), Some("id"))
    val a = freshRoot("pina")
    TxLog.cloneTable(spark, src, a)
    val b = freshRoot("pinb")
    TxLog.cloneTable(spark, a, b) // fork of a fork: b reads src dirs too
    // a full rewrite on the SOURCE orphans the two original dirs from
    // the source's own perspective — but both clones still read them
    TxLog.rewrite(spark, src, Some("id"))(_.where(col("id") < 50))
    (0 until 3).foreach(k => TxLog.append(spark, src,
      docs(500 + k * 10, 510 + k * 10), Some("id")))
    val gone1 = TxLog.vacuum(spark, src, retainVersions = 1, graceMs = 0L)
    assert(gone1.isEmpty,
      s"pre-fork dirs are pinned by live clones, got $gone1")
    assert(TxLog.snapshot(spark, a).count() === 200)
    assert(TxLog.snapshot(spark, b).count() === 200)
    // localize A; B still pins src through its own chain
    TxLog.optimizeRange(spark, a, "id", buckets = 4)
    val gone2 = TxLog.vacuum(spark, src, retainVersions = 1, graceMs = 0L)
    assert(gone2.isEmpty, s"b still reads src dirs, got $gone2")
    assert(TxLog.snapshot(spark, b).count() === 200)
    // localize B too: nothing pins the originals anymore — reclaimed
    TxLog.optimizeRange(spark, b, "id", buckets = 4)
    val gone3 = TxLog.vacuum(spark, src, retainVersions = 1, graceMs = 0L)
    assert(gone3.nonEmpty, "released pins must let the vacuum reclaim")
    assert(TxLog.snapshot(spark, a).count() === 200)
    assert(TxLog.snapshot(spark, b).count() === 200)
    assert(TxLog.snapshot(spark, src).count() === 80)
    // a DELETED clone pins nothing: fork, delete its log, vacuum moves on
    val c = freshRoot("pinc")
    TxLog.cloneTable(spark, src, c)
    TxLog.rewrite(spark, src, Some("id"))(_.where(col("id") < 20))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(c.stripSuffix("/t")))
    TxLog.append(spark, src, docs(800, 810), Some("id"))
    TxLog.append(spark, src, docs(810, 820), Some("id"))
    val gone4 = TxLog.vacuum(spark, src, retainVersions = 1, graceMs = 0L)
    assert(gone4.nonEmpty, "a deleted clone's marker must not pin")
    // marker hygiene: the dead fork's registration is debris — RunGc
    // reports it, --apply drops EXACTLY it (live markers survive)
    val lake = new java.io.File(src).getParentFile.getAbsolutePath
    val dry = graft.pipeline.RunGc.run(spark, lake, ageMinutes = 60)
      .filter(_.kind == "tx-stale-clone-marker")
    assert(dry.size === 1 && dry.head.action.startsWith("would-drop"))
    val applied = graft.pipeline.RunGc.run(spark, lake, ageMinutes = 60,
      apply = true).filter(_.kind == "tx-stale-clone-marker")
    assert(applied.size === 1 && applied.head.action.startsWith("dropped"))
    assert(TxLog.staleCloneMarkers(spark, src).isEmpty)
    assert(graft.pipeline.RunGc.run(spark, lake, ageMinutes = 60)
      .filter(_.kind == "tx-stale-clone-marker").isEmpty, "converged")
    // the LIVE clones' markers are untouched: a and b still registered
    assert(TxLog.snapshot(spark, a).count() === 200)
    assert(TxLog.snapshot(spark, b).count() === 200)
  }

  test("name lineage rides the fork: a pre-fork rename maps the clone's " +
      "base dirs; a clone-local rename diverges from the source") {
    val src = freshRoot("lsrc")
    TxLog.append(spark, src, docs(0, 50), Some("id"))
    TxLog.renameColumn(spark, src, "id", "k")        // pre-fork lineage
    val dst = freshRoot("ldst")
    TxLog.cloneTable(spark, src, dst)
    // the clone reads base dirs through the copied lineage records
    assert(TxLog.snapshot(spark, dst).columns.toSeq === Seq("k", "text"))
    assert(TxLog.snapshot(spark, dst).agg(sum("k")).head().getLong(0) ===
      (0L until 50L).sum)
    // clone-LOCAL rename: the fork's contract moves, the source's not
    TxLog.renameColumn(spark, dst, "k", "m")
    TxLog.append(spark, dst, (50 until 60)
      .map(i => (i.toLong, s"doc-$i")).toDF("m", "text"), Some("m"))
    assert(TxLog.snapshot(spark, dst).columns.toSeq === Seq("m", "text"))
    assert(TxLog.snapshot(spark, dst).count() === 60)
    assert(TxLog.snapshot(spark, src).columns.toSeq === Seq("k", "text"))
    // pre-everything travel from the clone speaks the original name
    assert(TxLog.snapshot(spark, dst, Some(1L)).columns.toSeq ===
      Seq("id", "text"))
    // a merge on the clone's NEW name updates a pre-fork row (the
    // touched base dir materializes locally under the mapped name)
    TxLog.merge(spark, dst, Seq((10L, "via-m")).toDF("m", "text"), "m")
    assert(TxLog.snapshot(spark, dst).where(col("m") === 10L)
      .select("text").as[String].head() === "via-m")
    assert(TxLog.snapshot(spark, src).where(col("k") === 10L)
      .select("text").as[String].head() === "doc-10")
  }

  test("clone vacuum locality: an aggressive vacuum on the clone deletes " +
      "only clone-resident dirs — the base tables stay whole") {
    val src = freshRoot("vsrc")
    TxLog.append(spark, src, docs(0, 100), Some("id"))
    val dst = freshRoot("vdst")
    TxLog.cloneTable(spark, src, dst)
    // churn in the clone: a local append then a full rewrite orphans it
    TxLog.append(spark, dst, docs(100, 120), Some("id"))
    TxLog.rewrite(spark, dst, Some("id"))(_.where(col("id") < 110))
    (0 until 3).foreach(k => TxLog.append(spark, dst,
      docs(200 + k * 10, 210 + k * 10), Some("id")))
    val gone = TxLog.vacuum(spark, dst, retainVersions = 1, graceMs = 0L)
    assert(gone.nonEmpty, "the orphaned local append must be reclaimed")
    assert(TxLog.snapshot(spark, dst).count() === 140)
    // the base never lost a byte
    assert(TxLog.snapshot(spark, src).count() === 100)
    // cloning into a non-empty root is refused loud
    intercept[IllegalArgumentException] {
      TxLog.cloneTable(spark, src, dst)
    }
  }

  test("the _cloned sentinel marks forked logs: travel reads on a clone " +
      "resolve through the head chain; a never-cloned table carries no " +
      "sentinel and travel reads stay exact without it") {
    val src = freshRoot("ssrc")
    TxLog.append(spark, src, docs(0, 50), Some("id"))
    TxLog.append(spark, src, docs(50, 100), Some("id"))
    val dst = freshRoot("sdst")
    val cut = TxLog.cloneTable(spark, src, dst)
    assert(new java.io.File(s"$dst/_txlog/_cloned").exists(),
      "cloneTable must write the sentinel into the fork's log")
    assert(!new java.io.File(s"$src/_txlog/_cloned").exists(),
      "the source was never forked INTO — no sentinel there")
    // a travel read BELOW the cut folds a prefix with no clone record;
    // the sentinel routes it through the head chain so pre-fork dirs
    // resolve against the base
    TxLog.append(spark, dst, docs(100, 120), Some("id"))
    assert(TxLog.snapshot(spark, dst, Some(cut - 1)).count() === 100)
    assert(TxLog.snapshot(spark, dst, Some(1L)).count() === 50)
    // the never-cloned source travel-reads exactly without the fold
    assert(TxLog.snapshot(spark, src, Some(1L)).count() === 50)
  }

  test("sentinel absence is inconclusive, not negative: a pre-sentinel-era " +
      "clone dst (records, no _cloned) still resolves travel reads below " +
      "the cut, and the first such read backfills the sentinel") {
    val src = freshRoot("presrc")
    TxLog.append(spark, src, docs(0, 40), Some("id"))
    TxLog.append(spark, src, docs(40, 80), Some("id"))
    val dst = freshRoot("predst")
    val cut = TxLog.cloneTable(spark, src, dst)
    // simulate a clone created by pre-sentinel code: records exist in
    // the log, but no sentinel file
    val sentinel = new java.io.File(s"$dst/_txlog/_cloned")
    assert(sentinel.delete(), "test setup: could not remove the sentinel")
    // the exact case the head fold exists for — a travel read below
    // the clone cut must resolve pre-fork dirs against the base, not
    // return an empty chain (wrong base root / FileNotFound)
    assert(TxLog.snapshot(spark, dst, Some(cut - 1)).count() === 80)
    assert(TxLog.snapshot(spark, dst, Some(1L)).count() === 40)
    // ...and the read pays the head fold ONCE: the sentinel is back
    assert(sentinel.exists(),
      "the inconclusive-path head fold must backfill _cloned")
  }

  test("a never-cloned table's first travel read backfills _noclones — " +
      "conclusive forever (clone records only enter a log at creation), " +
      "so later travel reads skip the head fold and stay exact") {
    val t = freshRoot("noclone")
    TxLog.append(spark, t, docs(0, 30), Some("id"))
    TxLog.append(spark, t, docs(30, 60), Some("id"))
    assert(TxLog.snapshot(spark, t, Some(1L)).count() === 30)
    assert(new java.io.File(s"$t/_txlog/_noclones").exists(),
      "the first inconclusive travel read must backfill _noclones")
    assert(!new java.io.File(s"$t/_txlog/_cloned").exists())
    assert(TxLog.snapshot(spark, t, Some(1L)).count() === 30)
    assert(TxLog.snapshot(spark, t, Some(2L)).count() === 60)
  }
}
