package graft

import graft.operators.TxLog
import org.apache.spark.sql.functions._

/** The r14 lakehouse hardening layer over [[TxLog]]: string-key merge
  * pruning through portable-hash manifest stats ([[TxLog.optimizeHash]]
  * clustering + interval-stab write paths), the injectable
  * conditional-put commit claimer (the object-store path — S3
  * `If-None-Match: *`), bounded conflict auto-retry, the narrowed
  * merge-vs-tombstone rule (key overlap, not ANY tombstone),
  * idempotent MERGE for exactly-once streaming CDC, vacuum retention
  * guards (a travel read below the recorded horizon fails with the
  * window named, not a parquet FileNotFound), manifest-stats health
  * audits, and the two writer races ADVICE r13 flagged (idempotent
  * append vs evolveSchema; any writer vs a concurrent addConstraint). */
class TxLakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txl_$tag").toString + "/t"

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"doc-$i")).toDF("id", "text")

  /** String-keyed docs: the common corpus shape (doc ids / URLs) whose
    * long cast yields no value span — only the hash stats prune. */
  private def sdocs(lo: Int, hi: Int) =
    (lo until hi).map(i => (f"doc-$i%06d", s"payload-$i"))
      .toDF("key", "text")

  test("string-key merge: hash-clustered table prunes the write path to " +
      "the stabbed buckets; untouched dirs stay on disk; results exact") {
    val root = freshRoot("smerge")
    TxLog.append(spark, root, sdocs(0, 2000), Some("key"))
    TxLog.optimizeHash(spark, root, "key", buckets = 16)
    val (_, before) = TxLog.liveFiles(spark, root)
    assert(before.size === 16)
    // every bucket carries the portable-hash stat; none a value stat
    // (string key: the long cast is null everywhere)
    assert(before.forall(_.statFor("key#h60").isDefined))
    assert(before.forall(_.statFor("key").isEmpty))
    // a 3-key update batch stabs at most 3 of 16 buckets
    val batch = Seq("doc-000007", "doc-000555", "doc-001234")
      .map(k => (k, s"upd-$k")).toDF("key", "text")
    val v = TxLog.merge(spark, root, batch, "key")
    val touched = TxLog.history(spark, root)
      .where(col("version") === v).head().getAs[Long]("n_removes")
    assert(touched >= 1 && touched <= 3,
      s"3 keys must stab <= 3 of 16 hash buckets, touched $touched")
    // the untouched buckets are the SAME dirs (immutable, never
    // rewritten) — byte identity by construction
    val (_, after) = TxLog.liveFiles(spark, root)
    val beforeDirs = before.map(_.dir).toSet
    val afterDirs = after.map(_.dir).toSet
    assert((beforeDirs & afterDirs).size === 16 - touched.toInt)
    // merged content exact: updates took, everything else untouched
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 2000)
    assert(snap.where(col("text").startsWith("upd-")).count() === 3)
    assert(snap.where(col("key") === "doc-000007").select("text")
      .as[String].head() === "upd-doc-000007")
    assert(snap.where(col("key") === "doc-000008").select("text")
      .as[String].head() === "payload-8")
    // string-key mergeDelete rides the same pruned path
    val v2 = TxLog.mergeDelete(spark, root,
      Seq("doc-000100").toDF("key"), "key")
    assert(TxLog.history(spark, root).where(col("version") === v2)
      .head().getAs[Long]("n_removes") <= 1)
    assert(TxLog.snapshot(spark, root).count() === 1999)
  }

  test("string-key merge conflicts: a hash-disjoint intervening append " +
      "commutes; one carrying a batch key aborts") {
    val root = freshRoot("sconf")
    TxLog.append(spark, root, sdocs(0, 500), Some("key"))
    TxLog.optimizeHash(spark, root, "key", buckets = 8)
    // the intervening append carries DIFFERENT keys: hash-disjointness
    // is provable (its dir's hash min/max brackets none of the batch's
    // key hashes) — pre-r14 this aborted unconditionally on a string key
    val b1 = Seq(("doc-000003", "upd-3")).toDF("key", "text")
    TxLog.mergeWithHook(spark, root, b1, "key", None, Seq.empty)(() =>
      TxLog.append(spark, root, sdocs(9000, 9001), Some("key")))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 501)
    assert(snap.where(col("text") === "upd-3").count() === 1)
    // an intervening append with the SAME key hash still aborts
    val b2 = Seq(("doc-000004", "upd-4")).toDF("key", "text")
    intercept[TxLog.TxConflictException] {
      TxLog.mergeWithHook(spark, root, b2, "key", None, Seq.empty)(() =>
        TxLog.append(spark, root,
          Seq(("doc-000004", "race")).toDF("key", "text"), Some("key")))
    }
  }

  test("conditional-put claimer: commits route through the injected store; " +
      "8 racing writers, every claim admitted exactly once") {
    val lake = java.nio.file.Files
      .createTempDirectory("graft_txl_cput").toString
    val root = s"$lake/t"
    // an atomic in-memory arbiter writing through to disk — the shape
    // of S3 `If-None-Match: *` (create iff absent, 412 otherwise)
    val admits =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    val rejections = new java.util.concurrent.atomic.AtomicInteger(0)
    val store = new TxLog.ConditionalPutStore {
      def putIfNoneMatch(path: String, bytes: Array[Byte]): Boolean = {
        puts.incrementAndGet()
        if (!admits.add(path)) {
          rejections.incrementAndGet(); false
        } else {
          val p = java.nio.file.Paths.get(path)
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, bytes)
          true
        }
      }
    }
    TxLog.registerClaimer(lake, new TxLog.ConditionalPutClaimer(store))
    try {
      val writers = 8
      val barrier = new java.util.concurrent.CyclicBarrier(writers)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val versions = try {
        (0 until writers).map { w =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
              TxLog.append(spark, root, docs(w * 100, w * 100 + 10),
                Some("id"))
            }
          })
        }.map(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      // exactly-once contiguous versions through the store's arbitration
      assert(versions.sorted === (1L to writers).toVector)
      assert(TxLog.snapshot(spark, root).count() === writers * 10L)
      // every commit went through the store (not the rename path), and
      // each path was admitted exactly once
      assert(puts.get() >= writers)
      assert(admits.size === writers)
      assert(puts.get() - rejections.get() === writers,
        "true-returns must equal commits — no double admit")
    } finally TxLog.unregisterClaimer(lake)
    // unregistered: the local rename path takes over seamlessly
    TxLog.append(spark, root, docs(9000, 9010), Some("id"))
    assert(TxLog.latestVersion(spark, root) === 9)
  }

  test("conflict auto-retry: a rewrite whose inputs are stolen re-resolves " +
      "and lands; a merge losing to an overlapping append re-merges it") {
    val root = freshRoot("retry")
    TxLog.append(spark, root, docs(0, 100), Some("id"))
    // attempt 1's inputs are stolen by a full rewrite fired from inside
    // the transform; the retry re-resolves the post-theft snapshot
    var calls = 0
    val v = TxLog.rewrite(spark, root, Some("id"), conflictRetries = 1) {
      snap =>
        calls += 1
        if (calls == 1)
          TxLog.rewrite(spark, root, Some("id"))(_.where(col("id") < 50))
        snap.where(col("id") >= 10)
    }
    assert(calls === 2, "the conflicted attempt must re-run in full")
    assert(v === 3)
    assert(TxLog.snapshot(spark, root).select("id").as[Long]
      .collect().sorted === (10L until 50L).toArray)
    // merge: attempt 1 loses to an overlapping intervening append
    // (fired once); the retry merges AGAINST it — the duplicate ids the
    // append landed collapse under the batch's keys
    val root2 = freshRoot("retrym")
    TxLog.append(spark, root2, docs(0, 100), Some("id"))
    var fired = false
    val batch = (0 until 10).map(i => (i.toLong, s"m-$i")).toDF("id", "text")
    TxLog.mergeWithHook(spark, root2, batch, "id", None, Seq.empty,
      conflictRetries = 1)(() =>
        if (!fired) { fired = true
          TxLog.append(spark, root2, docs(5, 8), Some("id")) })
    val snap2 = TxLog.snapshot(spark, root2)
    assert(snap2.count() === 100, "keys 5..7 must collapse to one row each")
    assert(snap2.where(col("id") < 10)
      .select("text").as[String].collect().forall(_.startsWith("m-")))
    // budget spent -> the conflict propagates (retries=0 keeps r13 behavior)
    var again = false
    intercept[TxLog.TxConflictException] {
      TxLog.mergeWithHook(spark, root2, batch, "id", None, Seq.empty)(() =>
        if (!again) { again = true
          TxLog.append(spark, root2, docs(5, 8), Some("id")) })
    }
  }

  test("narrowed tombstone rule: a tombstone disjoint from the merge's " +
      "output commutes; one masking a non-batch output row still aborts; " +
      "one hitting only batch keys re-inserts") {
    val root = freshRoot("dvnarrow")
    (0 until 5).foreach(k =>
      TxLog.append(spark, root, docs(k * 100, k * 100 + 100), Some("id")))
    // (a) DISJOINT: merge touches dir 1 (ids 150-159); the tombstone
    // masks id 450 in dir 4 — the merge's output never carries 450, so
    // both land (pre-r14: ANY intervening tombstone aborted)
    val b1 = (150 until 160).map(i => (i.toLong, s"u-$i")).toDF("id", "text")
    TxLog.mergeWithHook(spark, root, b1, "id", None, Seq.empty)(() =>
      TxLog.tombstone(spark, root, Seq(450L).toDF("id"), "id"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 499)
    assert(snap.where(col("id") === 450).count() === 0, "mask held")
    assert(snap.where(col("id") === 155).select("text")
      .as[String].head() === "u-155")
    // (b) RESURRECTION: the tombstone masks id 160 — a row the merge's
    // output (the rewritten dir 1) carries but the batch does not; the
    // merge's commit would outlive the mask — abort
    val b2 = (150 until 155).map(i => (i.toLong, s"w-$i")).toDF("id", "text")
    intercept[TxLog.TxConflictException] {
      TxLog.mergeWithHook(spark, root, b2, "id", None, Seq.empty)(() =>
        TxLog.tombstone(spark, root, Seq(160L).toDF("id"), "id"))
    }
    assert(TxLog.snapshot(spark, root).where(col("id") === 160).count() === 0)
    // (c) BATCH-KEY tombstone: masking exactly an upserted key is the
    // serialized tombstone-then-merge — the re-insert is the documented
    // semantic, so the merge commutes and the key lives with its new text
    val b3 = Seq((170L, "alive-again")).toDF("id", "text")
    TxLog.mergeWithHook(spark, root, b3, "id", None, Seq.empty)(() =>
      TxLog.tombstone(spark, root, Seq(170L).toDF("id"), "id"))
    assert(TxLog.snapshot(spark, root).where(col("id") === 170)
      .select("text").as[String].head() === "alive-again")
  }

  test("mergeIdempotent: a replayed change batch commits at most once — " +
      "sequentially, after later batches, and racing") {
    val root = freshRoot("midem")
    TxLog.append(spark, root, docs(0, 100), Some("id"))
    val b1 = (10 until 15).map(i => (i.toLong, s"cdc1-$i", false))
      .toDF("id", "text", "del")
    val (v1, did1) = TxLog.mergeIdempotent(spark, root, b1, "id",
      "cdc", 1L, deleteCol = Some("del"))
    assert(v1 === 2 && did1)
    // immediate replay: same version, nothing committed
    val (v1b, did1b) = TxLog.mergeIdempotent(spark, root, b1, "id",
      "cdc", 1L, deleteCol = Some("del"))
    assert(v1b === 2 && !did1b)
    // batch 2 deletes a key; then a LATE replay of batch 1 (the
    // dangerous window: re-applying would re-run its rewrite against
    // the newer state) must be a no-op
    val b2 = Seq((20L, null.asInstanceOf[String], true))
      .toDF("id", "text", "del")
    val (v2, did2) = TxLog.mergeIdempotent(spark, root, b2, "id",
      "cdc", 2L, deleteCol = Some("del"))
    assert(v2 === 3 && did2)
    val before = TxLog.snapshot(spark, root).orderBy("id").collect()
    val (v1c, did1c) = TxLog.mergeIdempotent(spark, root, b1, "id",
      "cdc", 1L, deleteCol = Some("del"))
    assert(v1c === 2 && !did1c)
    assert(TxLog.snapshot(spark, root).orderBy("id").collect() === before)
    assert(TxLog.snapshot(spark, root).where(col("id") === 20).count() === 0)
    // racing replays of one token: exactly one commits
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    val b3 = Seq((30L, "cdc3", false)).toDF("id", "text", "del")
    val ts = (0 until 2).map(_ => new Thread(() => {
      barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
      results.add(TxLog.mergeIdempotent(spark, root, b3, "id",
        "cdc", 3L, deleteCol = Some("del"), conflictRetries = 2))
    }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    val rs = results.toArray(Array.empty[(Long, Boolean)])
    assert(rs.count(_._2) === 1, rs.mkString(","))
    assert(rs.map(_._1).distinct.length === 1)
    assert(TxLog.snapshot(spark, root).where(col("text") === "cdc3")
      .count() === 1)
  }

  test("retention guard: travel below a vacuum's recorded horizon fails " +
      "naming the window; reads at or above it stay exact") {
    val root = freshRoot("retain")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    Thread.sleep(5); val tEarly = System.currentTimeMillis(); Thread.sleep(5)
    TxLog.append(spark, root, docs(10, 20), Some("id"))
    TxLog.rewrite(spark, root, Some("id"))(_.where(col("id") < 5))
    TxLog.append(spark, root, docs(100, 110), Some("id"))
    // a DRY vacuum (nothing reclaimed) records no horizon — everything
    // stays readable
    assert(TxLog.vacuum(spark, root, retainVersions = 10,
      graceMs = 3600 * 1000).isEmpty)
    assert(TxLog.snapshot(spark, root, Some(2)).count() === 20)
    // crash-orphan debris (a dir NO manifest ever named): reclaimed,
    // but NO horizon recorded — deleting it invalidates no travel
    // read, and a gc commit would advance head and silently shrink
    // the version-counted window
    docs(900, 905).write.parquet(s"$root/data/orphan-crashed")
    assert(TxLog.vacuum(spark, root, retainVersions = 10, graceMs = 0)
      === Seq("data/orphan-crashed"))
    assert(TxLog.latestVersion(spark, root) === 4, "no gc commit")
    assert(TxLog.snapshot(spark, root, Some(2)).count() === 20)
    // a vacuum reclaiming LOG-REFERENCED dirs records horizon =
    // head - retain + 1 = 4 as a gc commit (v5)
    val gone = TxLog.vacuum(spark, root, retainVersions = 1, graceMs = 0)
    assert(gone.size === 2, gone.mkString(","))
    assert(TxLog.latestVersion(spark, root) === 5)
    // below the horizon: the window violation is named at plan time —
    // not a parquet FileNotFound three stages into a job
    val e = intercept[TxLog.TxRetentionException] {
      TxLog.snapshot(spark, root, Some(2))
    }
    assert(e.getMessage.contains("horizon v4") &&
      e.getMessage.contains("retainVersions=1"), e.getMessage)
    intercept[TxLog.TxRetentionException] {
      TxLog.versionAtTime(spark, root, tEarly)
    }
    intercept[TxLog.TxRetentionException] {
      TxLog.changes(spark, root, 1, 3)
    }
    intercept[TxLog.TxRetentionException] {
      TxLog.snapshotRangeMulti(spark, root, Seq(("id", 0L, 1000L)), Some(2))
    }
    // at/above the horizon: exact reads, and the gc commit itself is a
    // metadata-only CDC window (empty delta, not a crash)
    assert(TxLog.snapshot(spark, root, Some(4)).count() === 15)
    assert(TxLog.snapshot(spark, root).count() === 15)
    assert(TxLog.changes(spark, root, 4, 5).count() === 0)
    // history still lists every commit, gc included
    assert(TxLog.history(spark, root).count() === 5)
  }

  test("metadata-only CDC windows stream as empty deltas in the window-end " +
      "schema — the per-version tail survives evolveSchema/addConstraint") {
    val root = freshRoot("mdcdc")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    TxLog.evolveSchema(spark, root, "id BIGINT, text STRING, lang STRING")
    TxLog.addConstraint(spark, root, "id_pos", "id >= 0")
    TxLog.append(spark, root,
      (10 until 15).map(i => (i.toLong, s"doc-$i", "en"))
        .toDF("id", "text", "lang"), Some("id"))
    // the two metadata windows: empty, but SHAPED (window-end schema +
    // CDC columns) so a downstream union/merge just sees zero rows
    Seq(2L, 3L).foreach { v =>
      val d = TxLog.changes(spark, root, v - 1, v)
      assert(d.count() === 0)
      assert(d.columns.toSeq ===
        Seq("id", "text", "lang", "__version", "__change"))
    }
    // the replication loop the repo ships runs clean across them
    var applied = 0L
    (1L to TxLog.latestVersion(spark, root)).foreach { v =>
      applied += TxLog.changes(spark, root, v - 1, v).count()
    }
    assert(applied === 15)
  }

  test("idempotent append vs concurrent evolveSchema: the collision " +
      "re-checks the pin — the old-generation batch aborts instead of " +
      "silently reverting the evolution (ADVICE r13)") {
    val root = freshRoot("idemevo")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    val evolved = "id BIGINT, text STRING, lang STRING"
    intercept[TxLog.TxConflictException] {
      TxLog.appendIdempotentWithHook(spark, root, docs(10, 20),
        "intake", 7L, Some("id"))(() =>
          TxLog.evolveSchema(spark, root, evolved))
    }
    // the pin is still the EVOLVED schema (the pre-fix failure mode:
    // the stale batch's manifest re-pinned the old DDL); compare in
    // the normalized toDDL form the log stores
    assert(TxLog.pinnedSchema(spark, root).contains(
      org.apache.spark.sql.types.StructType.fromDDL(evolved).toDDL))
    // and the token did NOT land: the batch retries cleanly in the new
    // shape under the same id
    val (v, did) = TxLog.appendIdempotent(spark, root,
      (10 until 20).map(i => (i.toLong, s"doc-$i", "en"))
        .toDF("id", "text", "lang"), "intake", 7L, Some("id"))
    assert(did && v === 3)
    assert(TxLog.snapshot(spark, root).count() === 20)
  }

  test("writer vs concurrent addConstraint: the claim collision aborts — " +
      "unvalidated rows can never land past a live constraint (ADVICE r13)") {
    val root = freshRoot("consrace")
    TxLog.append(spark, root, docs(0, 50), Some("id"))
    // the merge's output was written BEFORE the constraint existed; on
    // collision it must abort, not claim head+1
    val batch = Seq((5L, "upd-5")).toDF("id", "text")
    val e = intercept[TxLog.TxConflictException] {
      TxLog.mergeWithHook(spark, root, batch, "id", None, Seq.empty)(() =>
        TxLog.addConstraint(spark, root, "text_tag",
          "text LIKE 'doc-%' OR text LIKE 'ok-%'"))
    }
    assert(e.getMessage.contains("CHECK constraint"), e.getMessage)
    // same rule on the idempotent-append collision path
    intercept[TxLog.TxConflictException] {
      TxLog.appendIdempotentWithHook(spark, root, docs(50, 60),
        "intake", 1L, Some("id"))(() =>
          TxLog.addConstraint(spark, root, "id_cap", "id < 100000"))
    }
    // the retry path validates against the now-live set: a conforming
    // batch lands, a violating one fails mid-write naming the rule
    TxLog.merge(spark, root, Seq((5L, "ok-5")).toDF("id", "text"), "id")
    intercept[TxLog.TxConstraintException] {
      TxLog.merge(spark, root, Seq((6L, "bad")).toDF("id", "text"), "id")
    }
    val snap = TxLog.snapshot(spark, root)
    assert(snap.where(col("id") === 5).select("text")
      .as[String].head() === "ok-5")
    assert(snap.count() === 50)
  }

  test("string-key appendPartitioned: each batch lands hash-bucketed, so " +
      "a keyed merge stabs <=K buckets per batch — never a whole batch") {
    val root = freshRoot("sapart")
    TxLog.appendPartitioned(spark, root, sdocs(0, 400), "key", buckets = 8)
    TxLog.appendPartitioned(spark, root, sdocs(400, 800), "key", buckets = 8)
    val (_, live) = TxLog.liveFiles(spark, root)
    assert(live.size === 16, "8 hash buckets per batch")
    assert(live.forall(_.statFor("key#h60").isDefined),
      "every bucket carries a tight hash span")
    // a 1-key merge stabs at most one bucket per batch; pre-r14 a
    // string-keyed batch landed ONE full-span dir, so every merge
    // rewrote every batch whole
    val v = TxLog.merge(spark, root,
      Seq(("doc-000123", "upd")).toDF("key", "text"), "key")
    val touched = TxLog.history(spark, root)
      .where(col("version") === v).head().getAs[Long]("n_removes")
    assert(touched >= 1 && touched <= 2,
      s"1 key must stab <=1 bucket per batch, touched $touched")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 800)
    assert(snap.where(col("text") === "upd").count() === 1)
    // empty batches refuse loud
    intercept[IllegalArgumentException] {
      TxLog.appendPartitioned(spark, root, sdocs(0, 0), "key", 8)
    }
  }

  test("snapshotKeys: point reads scan only the dirs that can hold a key — " +
      "hash-pruned for string keys, span-pruned for long keys, masks apply") {
    val root = freshRoot("skeys")
    TxLog.append(spark, root, sdocs(0, 2000), Some("key"))
    TxLog.optimizeHash(spark, root, "key", buckets = 16)
    val want = Seq("doc-000007", "doc-000042", "doc-001234", "doc-999999")
      .toDF("key")
    // pruned: the planned scan touches at most |keys| of the 16
    // buckets (audited pre-tombstone — the mask join would make
    // input_file_name ambiguous across its two parquet sources)
    val dirs = TxLog.snapshotKeys(spark, root, want, "key")
      .select(input_file_name()).distinct().as[String]
      .collect().map(_.split('/').dropRight(1).last).distinct
    assert(dirs.length <= 4, s"expected <=4 bucket dirs, got ${dirs.length}")
    // exact, mask applied: present keys return, the tombstoned and
    // the absent do not
    TxLog.tombstone(spark, root, Seq("doc-000042").toDF("key"), "key")
    val got = TxLog.snapshotKeys(spark, root, want, "key")
    assert(got.select("key").as[String].collect().sorted ===
      Array("doc-000007", "doc-001234"))
    // long keys prune by value span: 5 range-clustered dirs, a 2-key
    // fetch reads the 2 owning dirs
    val root2 = freshRoot("skeysl")
    (0 until 5).foreach(k =>
      TxLog.append(spark, root2, docs(k * 100, k * 100 + 100), Some("id")))
    val got2 = TxLog.snapshotKeys(spark, root2,
      Seq(7L, 333L).toDF("id"), "id")
    assert(got2.select("id").as[Long].collect().sorted === Array(7L, 333L))
    val dirs2 = got2.select(input_file_name()).distinct().as[String]
      .collect().map(_.split('/').dropRight(1).last).distinct
    assert(dirs2.length === 2, s"expected 2 dirs, got ${dirs2.length}")
    // an empty key set returns an empty frame in the table schema
    val none = TxLog.snapshotKeys(spark, root2,
      Seq.empty[Long].toDF("id"), "id")
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "text"))
  }

  test("statsAudit + RunGc --audit-stats: interleaved appends read as " +
      "k-fold overlap, the finding recommends the matching optimize, and " +
      "the optimized table audits clean") {
    val lake = java.nio.file.Files
      .createTempDirectory("graft_txl_audit").toString
    val root = s"$lake/t"
    // five interleaved appends, each spanning the whole key range: the
    // per-dir spans tile the domain five times over — every range read
    // and every merge scans every dir
    (0 until 5).foreach { k =>
      val ids = (0 until 500).filter(_ % 5 == k)
      TxLog.append(spark, root,
        ids.map(i => (i.toLong, s"doc-$i")).toDF("id", "text"), Some("id"))
    }
    val before = TxLog.statsAudit(spark, root, "id").head()
    assert(before.getAs[String]("stat") === "id")
    assert(before.getAs[Long]("n_dirs") === 5)
    val ppm0 = before.getAs[Long]("overlap_ppm")
    assert(ppm0 > 4500000L && ppm0 < 5100000L, s"expected ~5e6, got $ppm0")
    val found = graft.pipeline.RunGc.run(spark, lake, ageMinutes = 60,
      auditStats = true)
    val deg = found.filter(_.kind == "tx-stats-degraded")
    assert(deg.size === 1 && deg.head.action.startsWith(
      "recommend-optimizeRange-or-zorder-on-id-overlap-"),
      found.mkString("; "))
    // the recommended maintenance restores the tiling to ~1x
    TxLog.optimizeRange(spark, root, "id", buckets = 8)
    val ppm1 = TxLog.statsAudit(spark, root, "id")
      .head().getAs[Long]("overlap_ppm")
    assert(ppm1 <= 1000000L, s"optimized tiling must be ~1e6, got $ppm1")
    assert(graft.pipeline.RunGc.run(spark, lake, ageMinutes = 60,
      auditStats = true).filter(_.kind == "tx-stats-degraded").isEmpty)
    // a STRING-keyed table audits the portable-hash stat and recommends
    // optimizeHash instead
    val lake2 = java.nio.file.Files
      .createTempDirectory("graft_txl_audith").toString
    val root2 = s"$lake2/t"
    (0 until 4).foreach(k =>
      TxLog.append(spark, root2, sdocs(k * 100, k * 100 + 100), Some("key")))
    val hAudit = TxLog.statsAudit(spark, root2, "key").head()
    assert(hAudit.getAs[String]("stat") === "key#h60")
    assert(hAudit.getAs[Long]("overlap_ppm") > 3000000L)
    val found2 = graft.pipeline.RunGc.run(spark, lake2, ageMinutes = 60,
      auditStats = true).filter(_.kind == "tx-stats-degraded")
    assert(found2.size === 1 &&
      found2.head.action.startsWith("recommend-optimizeHash-on-key-"),
      found2.mkString("; "))
    TxLog.optimizeHash(spark, root2, "key", buckets = 16)
    assert(TxLog.statsAudit(spark, root2, "key")
      .head().getAs[Long]("overlap_ppm") <= 3000000L)
    assert(graft.pipeline.RunGc.run(spark, lake2, ageMinutes = 60,
      auditStats = true).filter(_.kind == "tx-stats-degraded").isEmpty)
  }
}
