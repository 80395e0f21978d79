package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal TRANSACTIONAL table format over plain parquet — the
  * multi-writer commit story that [[Lease]] + the `_current` pointer
  * (reader atomicity, single writer) deliberately stop short of
  * (SCALE.md "what the lease cannot do"). The design is the published
  * Delta/Iceberg core reduced to its load-bearing primitive: an
  * ordered log of immutable commit manifests, each claimed with one
  * atomic create-if-absent, over immutable data directories.
  *
  * Layout:
  * {{{
  *   <root>/_txlog/v<%020d>.commit      one manifest per version
  *   <root>/_txlog/v<%020d>.checkpoint  full live-set snapshot
  *   <root>/data/<uuid>/                immutable parquet dirs
  * }}}
  *
  * THE COMMIT IS THE CLAIM: a writer prepares its data directory
  * completely, renders the manifest to a temp file, and publishes it
  * at `v<N>.commit` with an ATOMIC create-if-absent — hard link on a
  * local filesystem (POSIX `link(2)` fails with EEXIST atomically) or
  * `FileContext.rename(NONE)` on HDFS/viewfs (namenode-atomic).
  * Object-store connectors are REFUSED loudly: their rename is
  * copy+delete with a check-then-act existence test, so two writers
  * could both "claim" one version and silently lose a commit — the
  * correct mapping is a real conditional put (`If-None-Match: *`),
  * which needs a store-native integration this layer does not ship
  * (the Delta lesson: S3 commits go through a LogStore, not rename).
  * On supported filesystems exactly one writer wins each version;
  * losers observe a complete, fully-written manifest (the link shares
  * the temp file's inode — no partial-content window) and retry
  * against the new head.
  *
  * Concurrency semantics (optimistic, Delta's rules):
  *  - APPEND commits are blind adds of fresh directories — they
  *    commute with everything, so a losing appender re-claims at the
  *    next version unconditionally.
  *  - REWRITE commits (compaction, delete, filter) remove the exact
  *    live set they read. A losing rewriter re-validates: if any
  *    intervening commit removed one of its inputs, the rewrite
  *    ABORTS ([[TxConflictException]]) and its orphan data dir is
  *    reclaimed by [[vacuum]]; intervening appends are preserved (the
  *    rewrite removes only what it read, never the new adds).
  *
  * Readers are snapshot-isolated for free: the log listing resolves a
  * version, the manifest fold names its complete immutable live set,
  * and data dirs are never mutated — a reader at ANY interleaving
  * sees exactly version N for some N. Time travel is the same fold
  * stopped early; CDC is the per-commit add/remove delta.
  *
  * Scale posture (the 100 TB story):
  *  - manifests are metadata-sized (one line per data dir); readers
  *    fold from the latest CHECKPOINT, so resolving a snapshot reads
  *    O(commits since checkpoint) tiny files, not the whole history;
  *  - per-dir MIN/MAX stats on a chosen long key are recorded at
  *    commit time (from the parquet footers of the just-written dir),
  *    so range reads prune whole directories BEFORE Spark plans the
  *    scan ([[snapshotRange]]) — file skipping at the manifest level,
  *    composing with parquet row-group pruning below and z-order
  *    layout (x122) within;
  *  - a crashed writer leaves an unreferenced data dir and no
  *    manifest: invisible to every reader, swept by [[vacuum]] after
  *    the grace age.
  *
  * Reference anchor: the reference overwrites whole tables per run
  * (src/process_to_curated.py writes curated tables destructively,
  * docker-compose.yml single-writer Airflow); this layer is what lets
  * many such jobs share one lake safely.
  */
object TxLog {

  /** Per-directory min/max of one NAMED column (cast to long). The
    * column name travels WITH the stat — a range read on `keyCol`
    * prunes a dir only off a stat recorded FOR `keyCol`; a dir whose
    * stats were computed on some other column is stat-less for that
    * read and must scan (the pre-r13 form trusted any min/max for any
    * key, which could prune dirs that held matching rows on a table
    * with mixed stats columns — the in-plan predicate cannot recover a
    * pruned dir, so that was a silent-wrong-results hole). */
  final case class ColStat(col: String, min: Long, max: Long)

  /** One immutable data directory as recorded in a manifest. `dir` is
    * ROOT-RELATIVE (tables are relocatable); `stats` carries min/max
    * for each recorded column (possibly several — multi-predicate
    * range reads prune on any of them), absent entries are never
    * pruned on. `gen` is the ABSOLUTE version of a commit whose
    * `schema` is this dir's write-time schema (schema-evolution
    * readers resolve each dir's physical schema from it; rendered as
    * 0 = "this manifest itself" in fresh commits and resolved on
    * read). */
  final case class AddFile(dir: String, rows: Long,
      stats: Seq[ColStat] = Seq.empty, gen: Long = 0L,
      // per-column blocked Bloom filters (word index → 64-bit block;
      // [[bloomWords]] words = 2 KB/dir/column) — the point-predicate
      // stat kind: min/max spans cannot answer `url = '…'` on a
      // column the table is NOT clustered by, a Bloom can. Absent
      // (legacy dirs, rewritten dirs) always admits — conservative,
      // never wrong.
      blooms: Map[String, Array[Long]] = Map.empty) {
    def statFor(c: String): Option[ColStat] = stats.find(_.col == c)
    def min: Option[Long] = stats.headOption.map(_.min)
    def max: Option[Long] = stats.headOption.map(_.max)
  }

  /** A key TOMBSTONE (deletion vector, table-wide): `rel` is a
    * parquet dir of keys under `data/`, `keyCol` names the pinned
    * column they match, `version` the commit that published it. The
    * mask rule: a row in a data dir is deleted iff its key appears in
    * a tombstone whose version is ≥ the dir's add version — so rows
    * INSERTED AFTER the tombstone live (resurrection by re-insert is
    * the upsert semantic), and a tombstone becomes INERT once every
    * live dir postdates it (rewrites materialize masks by reading the
    * masked snapshot; their outputs postdate every prior tombstone). */
  final case class Tombstone(rel: String, keyCol: String, version: Long)

  /** One manifest: `action` is `append`, `rewrite`, `merge`,
    * `tombstone`, `evolve` or `checkpoint`. `schema` is the committed
    * frame's DDL — the table's schema PIN (the RunIntake rule: a
    * drifted batch is a loud error, never a silently unreadable
    * mixed-schema table). `txn` is the producer's (appId, batchId)
    * idempotence token (see [[appendIdempotent]]); `dvs` the key
    * tombstones this commit publishes. */
  final case class TxCommit(version: Long, action: String,
      adds: Seq[AddFile], removes: Seq[String], statsCol: Option[String],
      schema: Option[String] = None, txn: Option[(String, Long)] = None,
      dvs: Seq[Tombstone] = Seq.empty,
      constraints: Seq[(String, String)] = Seq.empty,
      dropConstraints: Seq[String] = Seq.empty,
      ts: Option[Long] = None,
      gc: Option[(Long, Long)] = None,
      clones: Seq[(Long, String)] = Seq.empty,
      evos: Seq[(Long, String, String, String)] = Seq.empty,
      // checkpoint-only anchors for TIMESTAMP AS OF: the PREFIX-MAX
      // in-commit timestamp over v1..version (None on pre-anchor
      // checkpoints and logs with ts-less commits) and the previous
      // checkpoint's version (0 = none) — the backscan chain that
      // turns wall-clock travel from O(history) manifest reads into
      // O(checkpoints-above-answer + one inter-checkpoint gap)
      tsMax: Option[Long] = None,
      prevCkpt: Option[Long] = None,
      // the table-level Bloom-column declaration (sticky: set by the
      // first appendCols(bloomCols=…), re-recorded by every writer so
      // merges and maintenance rewrites keep the stat kind alive)
      bloomCols: Option[Seq[String]] = None)

  /** A rewrite lost optimistic validation: an intervening commit
    * removed one of its inputs. Retry the whole rewrite on a fresh
    * snapshot. */
  final class TxConflictException(msg: String)
    extends RuntimeException(msg)

  /** A travel read asked for a version whose data dirs a later
    * [[vacuum]] may have reclaimed — the retention window, named. */
  final class TxRetentionException(msg: String)
    extends RuntimeException(msg)

  // ------------------------------------------------------------------
  // commit-claim seam — where 100 TB actually lives (object stores)
  // the filesystem's rename cannot arbitrate a claim; the store's
  // NATIVE conditional put can (S3 PutObject `If-None-Match: *`,
  // GCS `x-goog-if-generation-match: 0`, Azure `If-None-Match: *` —
  // all public, all "create iff absent, else 412"). The seam lets a
  // deployment inject that primitive per table-root prefix while the
  // local/HDFS fast path stays built in.
  // ------------------------------------------------------------------

  /** How a `v<N>.commit` manifest is atomically published. Exactly-one
    * winner per path is the ENTIRE correctness contract of the log —
    * an implementation that can return true twice for one path loses
    * commits silently. */
  trait CommitClaimer {
    /** Create `path` (absolute, under the table's `_txlog/`) holding
      * `bytes` iff absent — atomically, the store arbitrating. True =
      * claimed; after a true return the manifest must be durably
      * readable at `path` by the filesystem readers. False = someone
      * else holds the name (the caller revalidates and retries). */
    def putIfAbsent(path: String, bytes: Array[Byte]): Boolean
  }

  /** An object store's conditional-put primitive, shaped as S3's
    * `If-None-Match: *`: create-iff-absent, `false` on
    * 412 Precondition Failed. A real deployment backs this with the
    * store SDK (one call); the spec suite drives it with an atomic
    * in-memory arbiter that writes through to disk. */
  trait ConditionalPutStore {
    def putIfNoneMatch(path: String, bytes: Array[Byte]): Boolean
  }

  /** [[CommitClaimer]] over a [[ConditionalPutStore]] — the S3-style
    * claim path: the conditional put IS both the write and the
    * arbitration, no rename anywhere. */
  final class ConditionalPutClaimer(store: ConditionalPutStore)
      extends CommitClaimer {
    def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
      store.putIfNoneMatch(path, bytes)
  }

  private val claimers =
    new java.util.concurrent.ConcurrentHashMap[String, CommitClaimer]()

  /** Route commit claims for every table root under `rootPrefix`
    * through `claimer` (longest registered prefix wins). This is how
    * the tx layer runs on a store the scheme allowlist refuses:
    * register a [[ConditionalPutClaimer]] over the store's native
    * conditional put. Reads stay on the filesystem connector
    * (list/read need no atomicity). */
  def registerClaimer(rootPrefix: String, claimer: CommitClaimer): Unit =
    claimers.put(rootPrefix, claimer)

  def unregisterClaimer(rootPrefix: String): Unit =
    claimers.remove(rootPrefix)

  private def claimerFor(root: String): Option[CommitClaimer] = {
    import scala.jdk.CollectionConverters._
    claimers.asScala.filter { case (p, _) => root.startsWith(p) }
      .toSeq.sortBy(-_._1.length).headOption.map(_._2)
  }

  private val CommitRe = """v(\d{20})\.commit""".r
  private val CheckpointRe = """v(\d{20})\.checkpoint""".r

  // ------------------------------------------------------------------
  // filesystem plumbing — manifests go through the RAW fs (no .crc
  // sidecars: their integrity is the atomicity of the publish, and the
  // checksum layer's two-step rename is exactly the race the pointer
  // work already evicted, SCALE.md "Reader-atomic tables")
  // ------------------------------------------------------------------

  private def rawFs(spark: SparkSession, p: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  private def logDir(root: String) = s"$root/_txlog"

  private def manifestName(version: Long, kind: String): String =
    f"v$version%020d.$kind"

  /** Filesystem schemes where `FileContext.rename(NONE)` is a real
    * atomic no-overwrite rename (namenode-arbitrated). Everything else
    * that isn't the local FS is refused — on s3a/gcs/abfs delegates
    * the dst-exists check is check-then-act, so two writers could both
    * claim one version and one manifest would silently overwrite the
    * other. */
  private val AtomicRenameSchemes = Set("hdfs", "viewfs", "file")

  /** Publish `bytes` at `<logDir>/<name>` atomically, failing (false)
    * if the name is already claimed. Local FS: write temp + hard link
    * (atomic EEXIST, and the published name is born fully written —
    * it IS the temp file's inode). HDFS-family FS: temp + no-overwrite
    * FileContext rename (namenode-atomic). Any other scheme: refused
    * loudly (see [[AtomicRenameSchemes]]) — a quietly racy claim is
    * worse than no claim. */
  private def publishIfAbsent(spark: SparkSession, root: String,
      name: String, bytes: Array[Byte]): Boolean = {
    claimerFor(root) match {
      // injected conditional-put path: the store arbitrates AND writes
      // — no temp file, no rename, no existence pre-check (the put is
      // the truth, and a pre-check would just be a wasted round trip)
      case Some(c) =>
        val won = c.putIfAbsent(s"${logDir(root)}/$name", bytes)
        writeHint(spark, root, name) // manifest exists either way
        return won
      case None =>
    }
    val fs = rawFs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(logDir(root))
    fs.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    if (fs.exists(dst)) { // cheap pre-check; the claim below is the truth
      writeHint(spark, root, name)
      return false
    }
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val claimed = fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val dstNio = java.nio.file.Paths.get(dst.toUri.getPath)
        val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
        try { java.nio.file.Files.createLink(dstNio, tmpNio); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case other =>
        if (!AtomicRenameSchemes.contains(other.getScheme)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(
            s"TxLog: filesystem scheme '${other.getScheme}' has no " +
              "atomic create-if-absent — rename there is check-then-act, " +
              "so concurrent writers could silently lose commits. Use a " +
              "local/HDFS root, or registerClaimer(rootPrefix, new " +
              "ConditionalPutClaimer(store)) over the store's native " +
              "conditional put (S3 `If-None-Match: *`) to claim there.")
        }
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, spark.sparkContext.hadoopConfiguration)
        try { fc.rename(tmp, dst); true } // Rename.NONE: fails if dst exists
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(dst) => false
        }
    }
    fs.delete(tmp, false)
    writeHint(spark, root, name) // the manifest exists either way
    claimed
  }

  // ---- manifest cache ----------------------------------------------
  // Manifests are IMMUTABLE once visible: publishIfAbsent arbitrates
  // exactly one winner per name (rename-if-absent / conditional put)
  // and nothing in the engine deletes or rewrites a published
  // manifest — so a (root, name) → TxCommit cache can never serve
  // stale content, only save the re-read. This is what makes repeated
  // travel/maintenance statements in one session cheap: the second
  // identical TIMESTAMP AS OF reads ZERO manifests. Bounded by an
  // approximate weight (add/remove line count) so a handful of
  // 100k-dir checkpoint manifests cannot pin the driver heap;
  // access-ordered eviction (LRU).
  private val manifestCacheBudget = 1 << 20 // ~1M add-lines across entries
  private object manifestCache {
    private var weight = 0L
    private val map = new java.util.LinkedHashMap[String, TxCommit](
      256, 0.75f, true)
    private def weightOf(c: TxCommit): Long =
      c.adds.size.toLong + c.removes.size + c.dvs.size + 16L
    def get(key: String): Option[TxCommit] =
      synchronized(Option(map.get(key)))
    def put(key: String, c: TxCommit): Unit = synchronized {
      if (map.containsKey(key)) return
      map.put(key, c); weight += weightOf(c)
      val it = map.entrySet().iterator()
      while (weight > manifestCacheBudget && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { weight -= weightOf(e.getValue); it.remove() }
      }
    }
    def dropPrefix(prefix: String): Unit = synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.startsWith(prefix)) {
          weight -= weightOf(e.getValue); it.remove()
        }
      }
    }
    def clear(): Unit = synchronized { map.clear(); weight = 0L }
  }

  // The immutability the cache rides on is the ENGINE's contract —
  // an external `rm -rf table && rebuild` (test fixtures, CI retry
  // loops) legally reuses every manifest NAME with new content. The
  // guard: each logical read validates a per-root signature (v1
  // commit's mtime+length — the one manifest every log has) via
  // [[readHint]], the funnel every fold/head/walk enters through;
  // a changed signature drops the root's cached entries. One stat
  // per operation, not per manifest — the repeated-statement path
  // still performs zero manifest READS.
  private val rootSigs =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private def validateCacheRoot(spark: SparkSession, root: String): Unit = {
    val key = logDir(root)
    val sig = try {
      val st = rawFs(spark, root).getFileStatus(
        new org.apache.hadoop.fs.Path(key, manifestName(1, "commit")))
      (st.getModificationTime, st.getLen)
    } catch { case scala.util.control.NonFatal(_) => (-1L, -1L) }
    val old = rootSigs.put(key, sig)
    if (old != null && old != sig) manifestCache.dropPrefix(key + "/")
  }
  /** Filesystem manifest reads actually performed (cache misses) —
    * the spec-pinned counter behind "a repeated statement reads 0
    * manifests". */
  private val manifestIoReads = new java.util.concurrent.atomic.AtomicLong
  private[graft] def manifestReadCount: Long = manifestIoReads.get()
  private[graft] def clearManifestCache(): Unit = {
    manifestCache.clear(); rootSigs.clear()
  }

  private def readManifest(spark: SparkSession, root: String,
      name: String): TxCommit = {
    val key = s"${logDir(root)}/$name"
    manifestCache.get(key) match {
      case Some(c) => c
      case None =>
        val c = readManifestIo(spark, root, name)
        manifestCache.put(key, c)
        c
    }
  }

  private def readManifestIo(spark: SparkSession, root: String,
      name: String): TxCommit = {
    manifestIoReads.incrementAndGet()
    val fs = rawFs(spark, root)
    val p = new org.apache.hadoop.fs.Path(logDir(root), name)
    val in = fs.open(p)
    val text =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val version = name match {
      case CommitRe(v) => v.toLong
      case CheckpointRe(v) => v.toLong
      case other => throw new IllegalArgumentException(
        s"not a manifest name: $other")
    }
    var action = "append"
    var ts: Option[Long] = None
    var tsMax: Option[Long] = None
    var prevCkpt: Option[Long] = None
    var bloomColsDecl: Option[Seq[String]] = None
    var statsCol: Option[String] = None
    var schema: Option[String] = None
    var txn: Option[(String, Long)] = None
    var gc: Option[(Long, Long)] = None
    val adds = Seq.newBuilder[AddFile]
    val bloomRows = Seq.newBuilder[(String, String, Array[Long])]
    val removes = Seq.newBuilder[String]
    val dvs = Seq.newBuilder[Tombstone]
    val clones = Seq.newBuilder[(Long, String)]
    val evos = Seq.newBuilder[(Long, String, String, String)]
    val cons = Seq.newBuilder[(String, String)]
    val dropCons = Seq.newBuilder[String]
    text.split('\n').map(_.trim).filter(_.nonEmpty).foreach { line =>
      val (k, v) = line.span(_ != '=')
      val value = v.drop(1)
      k match {
        case "format" =>
          val major = value.toLong
          if (major > FormatMajor) throw new java.io.IOException(
            s"$name in $root uses manifest format $major; this reader " +
              s"understands <= $FormatMajor — upgrade before reading " +
              "(a later major may fold differently; misreading it " +
              "would corrupt the snapshot)")
        case "action" => action = value
        case "ts" => ts = Some(value.toLong)
        case "tsmax" => tsMax = Some(value.toLong)
        case "prevckpt" => prevCkpt = Some(value.toLong)
        case "bloomcols" =>
          bloomColsDecl = Some(value.split('|').toSeq.filter(_.nonEmpty))
        case "statscol" => statsCol = Some(value)
        case "schema" => schema = Some(value)
        case "txn" =>
          val bar = value.lastIndexOf('|')
          txn = Some((value.take(bar), value.drop(bar + 1).toLong))
        case "gc" => // `horizon|retainVersions` — the retention record
          val f = value.split('|')
          gc = Some((f(0).toLong, f(1).toLong))
        case "clone" => // `cutVersion|basePath` — dirs with gen below
          // the cut resolve under basePath (see [[cloneTable]])
          val bar = value.indexOf('|')
          clones += ((value.take(bar).toLong, value.drop(bar + 1)))
        case "rename" => // `from|to` in a commit; `v|from|to` folded
          val f = value.split('|')
          evos += (if (f.length >= 3) (f(0).toLong, "rename", f(1), f(2))
            else (version, "rename", f(0), f(1)))
        case "drop" => // `name` in a commit; `v|name` folded
          val f = value.split('|')
          evos += (if (f.length >= 2) (f(0).toLong, "drop", f(1), "")
            else (version, "drop", f(0), ""))
        case "add" =>
          // v1 layouts: legacy `dir|rows|mn|mx` (stats column implied
          // by the manifest-level statscol line, which renders BEFORE
          // the adds) and current `dir|rows|mn|mx|col|gen[|mn|mx|col…]`
          // (per-file named stats + schema generation; gen 0 = this
          // manifest's own version)
          val f = value.split('|')
          def opt(s: String) = if (s == "-") None else Some(s.toLong)
          val stats = Seq.newBuilder[ColStat]
          var gen = version
          if (f.length <= 4) {
            for (c <- statsCol; mn <- opt(f(2)); mx <- opt(f(3)))
              stats += ColStat(c, mn, mx)
          } else {
            if (f.length >= 6 && f(5).toLong != 0L) gen = f(5).toLong
            def triple(mnI: Int, mxI: Int, colI: Int): Unit =
              if (colI < f.length && f(colI) != "-")
                for (mn <- opt(f(mnI)); mx <- opt(f(mxI)))
                  stats += ColStat(f(colI), mn, mx)
            triple(2, 3, 4)
            var i = 6
            while (i + 2 < f.length) { triple(i, i + 1, i + 2); i += 3 }
          }
          adds += AddFile(f(0), f(1).toLong, stats.result(), gen)
        case "remove" => removes += value
        case "bloom" => // `dir|col|hexwords` — attached to adds below
          val p1 = value.indexOf('|')
          val p2 = value.indexOf('|', p1 + 1)
          val hex = value.substring(p2 + 1)
          val words = Array.tabulate(hex.length / 16)(i =>
            java.lang.Long.parseUnsignedLong(
              hex.substring(i * 16, i * 16 + 16), 16))
          bloomRows += ((value.substring(0, p1),
            value.substring(p1 + 1, p2), words))
        case "dv" =>
          // `rel|keyCol` in a commit (version = the commit's own);
          // `rel|keyCol|version` in a checkpoint fold
          val f = value.split('|')
          dvs += Tombstone(f(0), f(1),
            if (f.length >= 3) f(2).toLong else version)
        case "constraint" =>
          // `name|sqlExpr` — the expr may itself contain '|', so only
          // the FIRST separator splits
          val (n, e) = value.span(_ != '|')
          cons += ((n, e.drop(1)))
        case "dropconstraint" => dropCons += value
        case _ => // forward-compatible: unknown keys ignored
      }
    }
    val addsRaw = adds.result()
    val bloomsByDir = bloomRows.result().groupBy(_._1)
    val addsFinal =
      if (bloomsByDir.isEmpty) addsRaw
      else addsRaw.map(a => bloomsByDir.get(a.dir) match {
        case Some(bs) =>
          a.copy(blooms = bs.map(b => b._2 -> b._3).toMap)
        case None => a
      })
    TxCommit(version, action, addsFinal, removes.result(), statsCol,
      schema, txn, dvs.result(), cons.result(), dropCons.result(), ts, gc,
      clones.result(), evos.result(), tsMax, prevCkpt, bloomColsDecl)
  }

  /** Manifest format major version. Readers REFUSE a manifest from a
    * LATER major (its semantics may be incompatible — silently
    * misreading a future log corrupts snapshots); unknown KEYS within
    * a major stay ignorable (minor additions are forward-safe, the
    * `case _ =>` below). Bump only when fold semantics change. */
  val FormatMajor = 1

  private def renderManifest(action: String, adds: Seq[AddFile],
      removes: Seq[String], statsCol: Option[String],
      schema: Option[String] = None,
      txn: Option[(String, Long)] = None,
      dvs: Seq[Tombstone] = Seq.empty,
      dvVersions: Boolean = false,
      constraints: Seq[(String, String)] = Seq.empty,
      dropConstraints: Seq[String] = Seq.empty,
      gc: Option[(Long, Long)] = None,
      clones: Seq[(Long, String)] = Seq.empty,
      evos: Seq[(Long, String, String, String)] = Seq.empty,
      evoVersions: Boolean = false,
      tsMax: Option[Long] = None,
      prevCkpt: Option[Long] = None,
      bloomColsDecl: Option[Seq[String]] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("format=").append(FormatMajor).append('\n')
    sb.append("action=").append(action).append('\n')
    if (action != "checkpoint")
      sb.append("ts=").append(System.currentTimeMillis()).append('\n')
    // checkpoint-only travel anchors; rendered FIRST so a backscan
    // could stop after the head lines without parsing the live set
    tsMax.foreach(t => sb.append("tsmax=").append(t).append('\n'))
    prevCkpt.foreach(p => sb.append("prevckpt=").append(p).append('\n'))
    // Some(empty) renders an explicit CLEARING line (dropColumn on
    // the last declared column); None renders nothing (keep the fold)
    bloomColsDecl.foreach { cs =>
      cs.foreach(c => require(!c.contains('|') && !c.contains('\n'),
        s"bloom column name must not contain '|' or newlines: $c"))
      sb.append("bloomcols=").append(cs.mkString("|")).append('\n')
    }
    statsCol.foreach(c => sb.append("statscol=").append(c).append('\n'))
    schema.foreach(d => sb.append("schema=").append(d).append('\n'))
    txn.foreach { case (a, b) =>
      sb.append("txn=").append(a).append('|').append(b).append('\n') }
    gc.foreach { case (h, r) =>
      sb.append("gc=").append(h).append('|').append(r).append('\n') }
    clones.foreach { case (cut, base) =>
      require(!base.contains('|') && !base.contains('\n'),
        s"clone base path must not contain '|' or newlines: $base")
      sb.append("clone=").append(cut).append('|').append(base).append('\n')
    }
    evos.foreach { case (v, kind, from, to) =>
      require(!from.contains('|') && !to.contains('|') &&
        !from.contains('\n') && !to.contains('\n'),
        s"column names must not contain '|' or newlines: $from/$to")
      sb.append(kind).append('=')
      if (evoVersions) sb.append(v).append('|')
      sb.append(from)
      if (kind == "rename") sb.append('|').append(to)
      sb.append('\n')
    }
    dvs.foreach { d =>
      require(!d.keyCol.contains('|') && !d.keyCol.contains('\n'),
        s"tombstone key column must not contain '|' or newlines: ${d.keyCol}")
      sb.append("dv=").append(d.rel).append('|').append(d.keyCol)
      if (dvVersions) sb.append('|').append(d.version) // checkpoint fold
      sb.append('\n')
    }
    constraints.foreach { case (n, e) =>
      require(!n.contains('|') && !n.contains('\n') && !e.contains('\n'),
        s"constraint name must not contain '|'; name/expr no newlines: $n")
      sb.append("constraint=").append(n).append('|').append(e).append('\n')
    }
    dropConstraints.foreach(n =>
      sb.append("dropconstraint=").append(n).append('\n'))
    adds.foreach { a =>
      a.stats.foreach(s => require(
        !s.col.contains('|') && !s.col.contains('\n'),
        s"stats column name must not contain '|' or newlines: ${s.col}"))
      sb.append("add=").append(a.dir).append('|').append(a.rows)
      a.stats.headOption match {
        case Some(s) => sb.append('|').append(s.min).append('|')
          .append(s.max).append('|').append(s.col)
        case None => sb.append("|-|-|-")
      }
      sb.append('|').append(a.gen)
      a.stats.drop(1).foreach(s => sb.append('|').append(s.min)
        .append('|').append(s.max).append('|').append(s.col))
      sb.append('\n')
    }
    // Bloom stat blocks ride as their own lines (hex-packed words —
    // a variable-size blob has no slot in the positional add triple),
    // attached back to their AddFile by dir at parse
    adds.foreach { a =>
      a.blooms.toSeq.sortBy(_._1).foreach { case (c, words) =>
        require(!c.contains('|') && !c.contains('\n'),
          s"bloom column name must not contain '|' or newlines: $c")
        sb.append("bloom=").append(a.dir).append('|').append(c).append('|')
        words.foreach(w => sb.append(f"$w%016x"))
        sb.append('\n')
      }
    }
    removes.foreach(r => sb.append("remove=").append(r).append('\n'))
    sb.result().getBytes("UTF-8")
  }

  /** All manifest names in the log, ascending. */
  private def listLog(spark: SparkSession, root: String)
      : Seq[(Long, String, String)] = { // (version, kind, name)
    val fs = rawFs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(logDir(root))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case n @ CommitRe(v) => (v.toLong, "commit", n)
      case n @ CheckpointRe(v) => (v.toLong, "checkpoint", n)
    }.sortBy(t => (t._1, t._2))
  }

  // ---- the `_hint` head/checkpoint pointer -------------------------
  // The r16 depth probe measured the last O(history) term in the hot
  // read path: the fold reads O(since-checkpoint) MANIFESTS, but
  // discovering the head and the newest checkpoint paid one full
  // directory LISTING — linear in commit count (0.013 → 0.131 s at
  // 1k → 10k commits locally; an S3 LIST walks every page). `_hint`
  // is the Delta `_last_checkpoint` move generalized: a best-effort
  // `<head>|<ckpt>` pointer (ckpt −1 = unknown, for pre-hint logs
  // whose checkpoint history nobody has listed yet) written after
  // every commit/checkpoint publish. Readers treat it as a FLOOR,
  // never the truth: the head is re-derived by probing FORWARD with
  // exists() (versions are contiguous — a claim only lands at
  // latest+1), so a stale or lost hint costs extra probes, never a
  // wrong answer, and a torn/corrupt hint read falls back to the
  // listing. Versions only grow and manifests are never deleted, so
  // any recorded value ≤ the truth stays safe forever.

  private def hintPath(root: String) =
    new org.apache.hadoop.fs.Path(logDir(root), "_hint")

  private def readHint(spark: SparkSession,
      root: String): Option[(Long, Long)] =
    try {
      // every fold/head/walk funnels through here — the right seam
      // for the cache's external-rebuild guard (see validateCacheRoot)
      validateCacheRoot(spark, root)
      val fs = rawFs(spark, root)
      val p = hintPath(root)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        val parts = s.split("\\|")
        if (parts.length != 2) None
        else Some((parts(0).toLong, parts(1).toLong))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Record `name`'s existence in the hint (monotone merge; plain
    * overwrite — readers tolerate torn writes). Called after EVERY
    * publish attempt of a commit/checkpoint manifest, success or
    * claim-lost alike: either way the manifest EXISTS, which is the
    * only invariant the hint asserts. Best-effort — any failure is
    * swallowed (the listing fallback stays correct). */
  private def writeHint(spark: SparkSession, root: String,
      name: String): Unit =
    try {
      val (v, isCkpt) = name match {
        case CommitRe(x) => (x.toLong, false)
        case CheckpointRe(x) => (x.toLong, true)
        case _ => return
      }
      val old = readHint(spark, root)
      val h = math.max(old.map(_._1).getOrElse(0L), v)
      // first hint on a FRESH log (publishing v1) knows there is no
      // checkpoint (0); first hint on a PRE-EXISTING log cannot know
      // without a listing → −1 (fold falls back for checkpoint
      // discovery until one is published/claim-confirmed)
      val c0 = old.map(_._2).getOrElse(if (v == 1L) 0L else -1L)
      val c = if (isCkpt) math.max(c0, v) else c0
      val fs = rawFs(spark, root)
      val out = fs.create(hintPath(root), true)
      try out.write(s"$h|$c".getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** The head at-or-after `from` by FORWARD PROBING: versions are
    * contiguous, so `exists(v+1)` until absent finds the head in
    * O(head − from) stat calls — no listing. */
  private def headFrom(spark: SparkSession, root: String,
      from: Long): Long = {
    val fs = rawFs(spark, root)
    var v = from
    while (fs.exists(new org.apache.hadoop.fs.Path(logDir(root),
      manifestName(v + 1, "commit")))) v += 1
    v
  }

  /** The newest checkpoint's version, if any — the fold start
    * ([[graft.pipeline.RunGc]] reads the gap to head to decide when
    * maintenance should checkpoint again). Hint-served when known
    * (may understate between maintenance passes — advisory exactly
    * like the gap it feeds); listing otherwise. */
  def lastCheckpoint(spark: SparkSession, root: String): Option[Long] =
    readHint(spark, root) match {
      case Some((_, c)) if c > 0 => Some(c)
      case Some((_, 0)) => None
      case _ =>
        val vs = listLog(spark, root)
          .collect { case (v, "checkpoint", _) => v }
        if (vs.isEmpty) None else Some(vs.max)
    }

  /** Head version of the table (0 when the log is empty). O(gap)
    * forward probes from the hint; one listing on unhinted logs. */
  def latestVersion(spark: SparkSession, root: String): Long =
    readHint(spark, root) match {
      case Some((h, _)) => headFrom(spark, root, h)
      case None =>
        val vs = listLog(spark, root).collect { case (v, "commit", _) => v }
        if (vs.isEmpty) 0L else vs.max
    }

  /** The newest version whose IN-COMMIT timestamp is at or before
    * `tsMillis` — time travel by wall clock (Delta's timestampAsOf).
    * Every commit manifest records a `ts=` at render; resolution uses
    * the RUNNING MAXIMUM over versions, so clock skew between writers
    * (render-vs-claim reordering) can only coarsen a boundary, never
    * reorder versions — the prefix max is monotone, so the answer is
    * exactly (first violation − 1).
    *
    * CHECKPOINT-ANCHORED: every checkpoint records `tsmax` (the
    * prefix max over v1..ckpt, folded incrementally at checkpoint
    * time) and `prevckpt` (a back-pointer chain). Resolution
    * backscans the chain from the newest checkpoint to the newest one
    * whose tsmax ≤ target — each step ONE manifest read — then walks
    * commits forward from there with the early-exit prefix-max rule.
    * The common case ("as of an hour ago" on a 10k-commit log) reads
    * one checkpoint manifest plus O(since-checkpoint) commits instead
    * of the whole history; an OLD timestamp reads
    * O(checkpoints-above-answer) anchors plus one inter-checkpoint
    * gap. Logs with no anchored checkpoint (pre-anchor checkpoints,
    * ts-less commits under them) fall back to the prefix walk from
    * v1. Errors before the first commit's time, and on pre-r13 logs
    * whose commits carry no timestamp. */
  def versionAtTime(spark: SparkSession, root: String,
      tsMillis: Long): Long = {
    val head = latestVersion(spark, root) // hinted: no listing
    require(head > 0, s"versionAtTime: $root has no commits")
    // backscan the checkpoint chain for the newest anchor with
    // tsmax ≤ target: from there every covered commit satisfies the
    // prefix-max rule, so the answer is ≥ the anchor version
    var anchor = 0L                 // walk start (0 = from v1)
    var running = Long.MinValue     // prefix max over v1..anchor
    var walkCeil = head             // first version known to violate, −1
    var c = lastCheckpoint(spark, root).getOrElse(0L)
    var scanning = c >= 1
    while (scanning) {
      val m = readManifest(spark, root, manifestName(c, "checkpoint"))
      m.tsMax match {
        case Some(tm) if tm <= tsMillis =>
          anchor = c; running = tm; scanning = false
        case Some(tm) =>
          // this checkpoint's prefix already violates: the answer is
          // below it — no commit AT or above c needs reading
          walkCeil = math.min(walkCeil, c - 1)
          c = m.prevCkpt.getOrElse(0L)
          scanning = c >= 1
        case None =>
          // un-anchored checkpoint: nothing below is bracketable
          // without the full walk — fall back from v1
          scanning = false
      }
    }
    var best = anchor
    var v = anchor + 1
    var done = false
    while (v <= walkCeil && !done) {
      val cm = readManifest(spark, root, manifestName(v, "commit"))
      val t = cm.ts.getOrElse(
        throw new IllegalStateException(
          s"versionAtTime: commit v$v of $root carries no in-commit " +
            "timestamp (pre-timestamp log) — travel by version instead"))
      running = math.max(running, t)
      if (running <= tsMillis) { best = v; v += 1 } else done = true
    }
    require(best > 0,
      s"versionAtTime: $tsMillis predates the first commit of $root")
    // surface the retention violation HERE, not as a parquet
    // FileNotFound downstream — the head fold's horizon is the same
    // strictest-vacuum maximum the old full walk accumulated
    retentionGuard(spark, root, best, "versionAtTime")
    best
  }

  /** Snapshot at a WALL-CLOCK time: [[snapshot]] at
    * [[versionAtTime]]'s resolution. */
  def snapshotAt(spark: SparkSession, root: String,
      tsMillis: Long): DataFrame =
    snapshot(spark, root, Some(versionAtTime(spark, root, tsMillis)))

  /** The commits in `(fromV, toV]`, ascending — the CDC window. */
  /** Commit manifest NAMES at versions (fromV, toV], ascending —
    * hinted logs construct them directly (versions are contiguous),
    * unhinted ones pay the one listing. Every "walk some version
    * range" consumer (fold, CDC windows, pin/stats/txn backscans)
    * routes through here so the no-listing property holds engine-wide. */
  private def commitNamesBetween(spark: SparkSession, root: String,
      fromV: Long, toV: Long): Seq[String] =
    readHint(spark, root) match {
      case Some((h0, _)) =>
        val head = headFrom(spark, root, h0)
        (math.max(fromV + 1, 1L) to math.min(toV, head))
          .map(v => manifestName(v, "commit"))
      case None =>
        listLog(spark, root).collect {
          case (v, "commit", n) if v > fromV && v <= toV => n
        }
    }

  def commitsInRange(spark: SparkSession, root: String,
      fromV: Long, toV: Long): Seq[TxCommit] =
    commitNamesBetween(spark, root, fromV, toV)
      .map(readManifest(spark, root, _))

  /** The log fold: resolve (version, live files, live tombstones) at
    * `asOf` (head when None) — start from the newest checkpoint
    * at-or-before the target, fold the commits after it. Reads
    * O(commits since checkpoint) manifests — this is why long-lived
    * tables checkpoint. Tombstones drop from the fold once INERT
    * (every live dir postdates them — permanent, since add versions
    * only grow), so the masking anti-join's build side never carries
    * dead weight. */
  private final case class LogState(version: Long, files: Seq[AddFile],
      dvs: Seq[Tombstone], constraints: Seq[(String, String)],
      gcHorizon: Option[(Long, Long)],
      clones: Seq[(Long, String)] = Seq.empty,
      evos: Seq[(Long, String, String, String)] = Seq.empty,
      // prefix-max in-commit ts over v1..version (None when any
      // covered commit lacks ts and no checkpoint anchors it) and the
      // checkpoint this fold started from — both free to carry, both
      // feeding checkpoint()'s travel anchors
      tsMax: Option[Long] = None,
      ckptUsed: Option[Long] = None,
      bloomCols: Seq[String] = Seq.empty)

  /** Fold dispatch: the HINTED path constructs every manifest name
    * directly (versions are contiguous; head via [[headFrom]] probes)
    * — zero directory listings, O(since-checkpoint) reads, the shape
    * that stays flat at 10k+ commits. Falls back to the listing fold
    * when the hint is absent/unknown-checkpoint (pre-hint logs — one
    * `checkpoint()`/RunGc pass upgrades them) or when a travel read
    * needs a checkpoint OLDER than the hinted one. */
  private def foldLog(spark: SparkSession, root: String,
      asOf: Option[Long]): LogState = readHint(spark, root) match {
    case Some((h0, c)) if c >= 0 =>
      val head = headFrom(spark, root, h0)
      val target = math.min(asOf.getOrElse(head), head)
      if (target <= 0) {
        // mirror the listing path's target==0 shape (empty LogState →
        // the caller's "$root is empty at v0" error) so error behavior
        // never depends on whether a _hint file happens to exist;
        // negative targets keep the listing path's loud require
        require(target == 0,
          s"no commit at or before version $target in $root")
        foldEntries(spark, root, 0L, None, Seq.empty)
      } else if (c > target)
        // the hinted checkpoint postdates the travel target — an older
        // one may exist, only the listing knows
        foldLogListing(spark, root, asOf)
      else {
        val ckpt =
          if (c >= 1) Some((c, manifestName(c, "checkpoint"))) else None
        // the hint is published by non-atomic overwrite: a torn read
        // can expose a numeric PREFIX that parses cleanly yet names a
        // checkpoint that never existed — one stat here turns that
        // from a FileNotFound mid-fold into the documented listing
        // fallback (the hint is a floor, never the truth)
        if (ckpt.exists { case (_, n) => !rawFs(spark, root).exists(
          new org.apache.hadoop.fs.Path(logDir(root), n)) })
          foldLogListing(spark, root, asOf)
        else {
          val commits = ((c + 1) to target)
            .map(v => manifestName(v, "commit"))
          foldEntries(spark, root, target, ckpt, commits)
        }
      }
    case _ => foldLogListing(spark, root, asOf)
  }

  private def foldLogListing(spark: SparkSession, root: String,
      asOf: Option[Long]): LogState = {
    val entries = listLog(spark, root)
    val commitVs = entries.collect { case (v, "commit", _) => v }
    if (commitVs.isEmpty)
      return LogState(0L, Seq.empty, Seq.empty, Seq.empty, None, Seq.empty,
        Seq.empty)
    val target = math.min(asOf.getOrElse(commitVs.max), commitVs.max)
    require(commitVs.exists(_ <= target) || target == 0,
      s"no commit at or before version $target in $root")
    val ckpt = entries
      .collect { case (v, "checkpoint", n) if v <= target => (v, n) }
      .sortBy(_._1).lastOption
    val from = ckpt.map(_._1).getOrElse(0L)
    val commits = entries.collect {
      case (v, "commit", n) if v > from && v <= target => n
    }
    foldEntries(spark, root, target, ckpt, commits)
  }

  /** The shared fold body over resolved manifest names. */
  private def foldEntries(spark: SparkSession, root: String,
      target: Long, ckpt: Option[(Long, String)],
      commits: Seq[String]): LogState = {
    var live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    val cons = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val dvs = Seq.newBuilder[Tombstone]
    val clones = Seq.newBuilder[(Long, String)]
    val evos = Seq.newBuilder[(Long, String, String, String)]
    // the strictest vacuum horizon folds forward like the live set, so
    // a head fold answers the retention question in O(since-checkpoint)
    var gcH = Option.empty[(Long, Long)]
    def foldGc(g: Option[(Long, Long)]): Unit =
      g.foreach(n => if (gcH.forall(_._1 < n._1)) gcH = Some(n))
    // the prefix-max in-commit ts folds forward like everything else:
    // the checkpoint's recorded tsmax covers v1..ckpt, each commit's
    // ts extends it — unknown (pre-anchor checkpoint, ts-less commit)
    // poisons the fold to None, and checkpoint() then just omits the
    // anchor for this log
    var tsRun = ckpt match {
      case Some((_, n)) => readManifest(spark, root, n).tsMax
      case None => Some(Long.MinValue)
    }
    var blCols: Seq[String] = Seq.empty
    ckpt.foreach { case (_, n) =>
      val c = readManifest(spark, root, n)
      c.adds.foreach(a => live.update(a.dir, a))
      dvs ++= c.dvs
      clones ++= c.clones
      evos ++= c.evos
      c.constraints.foreach { case (cn, ce) => cons.update(cn, ce) }
      foldGc(c.gc)
      c.bloomCols.foreach(blCols = _)
    }
    commits.foreach { n =>
      val c = readManifest(spark, root, n)
      c.removes.foreach(live.remove)
      c.adds.foreach(a => live.update(a.dir, a))
      dvs ++= c.dvs
      clones ++= c.clones
      evos ++= c.evos
      c.dropConstraints.foreach(cons.remove)
      c.constraints.foreach { case (cn, ce) => cons.update(cn, ce) }
      foldGc(c.gc)
      tsRun = for (r <- tsRun; t <- c.ts) yield math.max(r, t)
      c.bloomCols.foreach(blCols = _) // latest declaration wins
    }
    val files = live.values.toSeq
    val liveDvs = dvs.result()
      .filter(dv => files.exists(_.gen <= dv.version))
    LogState(target, files, liveDvs, cons.toSeq,
      gcH, clones.result().distinct.sortBy(_._1),
      evos.result().distinct.sortBy(_._1),
      tsMax = tsRun.filter(_ != Long.MinValue),
      ckptUsed = ckpt.map(_._1),
      bloomCols = blCols)
  }

  /** Resolve the live file set at `asOf` (head when None). */
  def liveFiles(spark: SparkSession, root: String,
      asOf: Option[Long] = None): (Long, Seq[AddFile]) = {
    val st = foldLog(spark, root, asOf)
    (st.version, st.files)
  }

  /** The live (non-inert) tombstones at `asOf` — the masks a snapshot
    * read applies. */
  def liveTombstones(spark: SparkSession, root: String,
      asOf: Option[Long] = None): Seq[Tombstone] =
    foldLog(spark, root, asOf).dvs

  /** The table's CHECK constraints at `asOf` (name → SQL expression),
    * in first-added order. */
  def constraints(spark: SparkSession, root: String,
      asOf: Option[Long] = None): Seq[(String, String)] =
    foldLog(spark, root, asOf).constraints

  /** The table's pinned schema AT version `v`: the newest commit at or
    * before `v` that carries one (every commit written by this code
    * does; pre-pin manifests are tolerated as None — no enforcement on
    * legacy logs). Commits are never deleted (only data dirs vacuum),
    * so the scan always terminates at the founding commit. This is
    * also how a data dir's PHYSICAL schema resolves: each AddFile's
    * `gen` names the commit whose schema it was written under. */
  def pinnedSchemaAt(spark: SparkSession, root: String,
      v: Long): Option[String] =
    commitNamesBetween(spark, root, 0L, v).reverseIterator
      .map(n => readManifest(spark, root, n).schema)
      .collectFirst { case Some(d) => d }

  /** [[pinnedSchemaAt]] the head — the CURRENT pin new appends must
    * match. */
  def pinnedSchema(spark: SparkSession, root: String): Option[String] =
    pinnedSchemaAt(spark, root, Long.MaxValue)

  /** The table's stats/clustering column: the newest commit carrying a
    * `statscol` record — the key [[statsAudit]] (and RunGc's
    * `--audit-stats` pass) watches. None on a table that never
    * recorded stats (nothing to audit: no read ever pruned there). */
  def statsColumn(spark: SparkSession, root: String): Option[String] =
    statsColumnAt(spark, root, Long.MaxValue)

  /** [[statsColumn]] bounded at version `v` — what [[restore]] re-pins
    * (the head's clustering column may postdate the target and name a
    * column the restored pin no longer carries). */
  private def statsColumnAt(spark: SparkSession, root: String,
      v: Long): Option[String] =
    commitNamesBetween(spark, root, 0L, v).reverseIterator
      .map(n => readManifest(spark, root, n).statsCol)
      .collectFirst { case Some(c) => c }

  /** Nullability-normalized single-line DDL — the pin's equality form
    * (a parquet read-back relaxes nullability; that must not read as
    * drift). */
  private def ddlOf(df: DataFrame): String =
    org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true))).toDDL

  private def ddlNorm(ddl: String): String =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .fields.map(_.copy(nullable = true))).toDDL

  /** Align an in-memory frame to a target DDL (null backfill +
    * widening cast) — the frame-level form of [[readAligned]]'s
    * per-group alignment, for CDC parts built from snapshots. */
  private def alignTo(df: DataFrame, targetDdl: Option[String]): DataFrame =
    targetDdl match {
      case Some(t) if ddlNorm(ddlOf(df)) != ddlNorm(t) =>
        val tgt = org.apache.spark.sql.types.StructType.fromDDL(t)
        df.select(tgt.fields.map { f =>
          if (df.schema.fieldNames.contains(f.name))
            col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*)
      case _ => df
    }

  /** The physical root a dir or tombstone with add generation `gen`
    * resolves under in a possibly-CLONED log ([[cloneTable]]): the
    * base of the FIRST clone cut strictly above it. Logs are copied
    * wholesale at clone time, so a nested clone's record chain walks
    * to the nearest fork that postdates the dir — pre-fork dirs read
    * from the base table's storage (zero copies), post-fork dirs from
    * this table's own root. Non-cloned tables have no records and
    * always resolve locally. */
  private def baseFor(root: String, clones: Seq[(Long, String)],
      gen: Long): String =
    clones.find(_._1 > gen).map(_._2).getOrElse(root)

  /** Follow a physical column name written at generation `g` FORWARD
    * through the rename/drop evolution records above it: each rename
    * moves the lineage to its new name, a drop ends it (None — the
    * bytes are still in old files but no live logical column owns
    * them, so they read as absent; a later re-ADD of the same name is
    * a fresh lineage that must NOT resurrect them — exactly Delta's
    * column-mapping rule, expressed with names + versions instead of
    * field ids). */
  private def lineage(evos: Seq[(Long, String, String, String)], g: Long,
      phys: String): Option[String] = {
    var cur = phys
    evos.filter(_._1 > g).sortBy(_._1).foreach {
      case (_, "rename", a, b) => if (cur == a) cur = b
      case (_, "drop", a, _) => if (cur == a) return None
      case _ =>
    }
    Some(cur)
  }

  /** Read a set of live data dirs ALIGNED to the table schema at
    * `targetDdl` — the mixed-generation read behind schema evolution.
    * Dirs are grouped by their write-time schema generation (each
    * AddFile's `gen` resolves to a commit whose manifest records the
    * DDL the dir was physically written under — manifests, never
    * footer probing); a group already at the target reads directly
    * with the EXPLICIT schema (no footer inference jobs), and an
    * older-generation group reads under its OWN schema then aligns:
    * columns the evolution added backfill as typed nulls, widened
    * columns cast (int→bigint, float→double — the [[evolveSchema]]
    * whitelist, so the cast is always lossless). With no evolution in
    * the log this collapses to one plain multi-path read. */
  private def readAligned(spark: SparkSession, root: String,
      files: Seq[AddFile], targetDdl: Option[String],
      tagAdded: Boolean = false,
      clones: Seq[(Long, String)] = Seq.empty,
      evos: Seq[(Long, String, String, String)] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.types.StructType
    def path(f: AddFile) = s"${baseFor(root, clones, f.gen)}/${f.dir}"
    targetDdl match {
      case None if !tagAdded => // legacy log, no pin anywhere: infer
        spark.read.parquet(files.map(path): _*)
      case _ =>
        val target = targetDdl.map(StructType.fromDDL)
        val tNorm = targetDdl.map(ddlNorm)
        val groups = files.groupBy(_.gen).toSeq.sortBy(_._1)
        val parts = groups.map { case (g, fs) =>
          val df0 = (target, tNorm) match {
            case (Some(tgt), Some(tn)) =>
              val ddl = pinnedSchemaAt(spark, root, g).map(ddlNorm)
                .getOrElse(tn)
              val src = StructType.fromDDL(ddl)
              val df = spark.read.schema(src)
                .parquet(fs.map(path): _*)
              val relevant = evos.filter(_._1 > g)
              if (ddl == tn && relevant.isEmpty) df
              else {
                // head-name -> this generation's physical name, per
                // the rename/drop lineage (a physical column whose
                // lineage was dropped maps to NOTHING — a same-named
                // later column reads null here, never the old bytes)
                val physFor = src.fieldNames.flatMap(p =>
                  lineage(relevant, g, p).map(_ -> p)).toMap
                df.select(tgt.fields.map { f =>
                  physFor.get(f.name) match {
                    case Some(p) => col(p).cast(f.dataType).as(f.name)
                    case None => lit(null).cast(f.dataType).as(f.name)
                  }
                }.toSeq: _*)
              }
            case _ =>
              spark.read.parquet(fs.map(path): _*)
          }
          // the group key IS the add version (every commit records its
          // own schema, so a fresh add's generation is its commit) —
          // the tombstone mask's version comparison reads it
          if (tagAdded) df0.withColumn("__added", lit(g)) else df0
        }
        parts.reduce(_.unionByName(_))
    }
  }

  /** [[readAligned]] plus TOMBSTONE MASKING: a row is deleted iff its
    * key appears in a live tombstone whose version is at-or-after the
    * row's dir's add version. One anti-join per tombstoned key column
    * (almost always one), with the per-key MAX tombstone version as
    * the build side — tombstone key sets are takedown-sized, so the
    * join broadcasts at scale. */
  private def readMasked(spark: SparkSession, root: String,
      files: Seq[AddFile], targetDdl: Option[String],
      dvs: Seq[Tombstone],
      clones: Seq[(Long, String)] = Seq.empty,
      evos: Seq[(Long, String, String, String)] = Seq.empty): DataFrame =
    if (dvs.isEmpty) readAligned(spark, root, files, targetDdl,
      clones = clones, evos = evos)
    else {
      // dirs that postdate EVERY tombstone can never hold a masked row
      // — they bypass the anti-join entirely (after an optimize that
      // is the whole table; between takedowns it is every new append),
      // so the per-row probe tax applies only to the maskable vintage
      val maxDv = dvs.map(_.version).max
      val (maskable, clean) = files.partition(_.gen <= maxDv)
      val cleanPart =
        if (clean.isEmpty) None
        else Some(readAligned(spark, root, clean, targetDdl,
          clones = clones, evos = evos))
      val maskedPart = if (maskable.isEmpty) None else {
        val base = readAligned(spark, root, maskable, targetDdl,
          tagAdded = true, clones = clones, evos = evos)
        val masked = dvs
          .groupBy(d => lineage(evos, d.version, d.keyCol)
            .getOrElse(d.keyCol))
          .toSeq.sortBy(_._1)
          .foldLeft(base) { case (acc, (kc, ds)) =>
            val kt = acc.schema(kc).dataType
            // the key FILE is physical: it carries the name in force
            // when the takedown was published, not the head name
            val keys = ds.map(d => spark.read
                .parquet(s"${baseFor(root, clones, d.version)}/${d.rel}")
                .select(col(d.keyCol).cast(kt).as("__dvk"),
                  lit(d.version).as("__dvv")))
              .reduce(_.unionByName(_))
              .groupBy("__dvk").agg(max("__dvv").as("__dvv"))
            acc.join(keys, acc(kc) === keys("__dvk") &&
              acc("__added") <= keys("__dvv"), "left_anti")
          }
        Some(masked.drop("__added"))
      }
      (cleanPart.toSeq ++ maskedPart.toSeq).reduce(_.unionByName(_))
    }

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /** Hash-space size of the portable key hash: md5-60 values are
    * uniform in [0, 2^60) — the [[Kmv]] draw's space. */
  private[graft] val HashSpace: Long = 1L << 60

  /** The PORTABLE key hash behind string-key pruning: md5-60 of
    * "txkey:<key-as-string>" — the engine's standard replayable draw
    * (the [[Kmv]]/Bloom primitive), uniform in [0, 2^60), identical in
    * Spark and any external SQL with md5 (the oracle replays bucket
    * assignment and every prune decision exactly). Keys hash by their
    * STRING form, so the hash survives lossless widenings (int 5 and
    * bigint 5 both render "5"). Value min/max stats only exist for
    * long-castable columns; THIS stat covers the keys that have no
    * value span (recorded for non-numeric columns — [[wantsHashStat]];
    * numeric keys prune by value and skip the per-row md5). */
  private[graft] def keyHash(c: Column): Column =
    conv(substring(md5(concat_ws(":", lit("txkey"), c.cast("string"))),
      1, 15), 16, 10).cast("long")

  /** The stats name a column's key-hash min/max travels under in the
    * manifest ('#' cannot collide with the '|'-guarded rendering, and
    * a real column would have to be deliberately named this way). */
  private[graft] def hashStatName(c: String): String = s"$c#h60"

  /** Does a stats column of this type want the portable-hash span?
    * Numeric/temporal keys prune by their VALUE span everywhere
    * ([[hashAdmitted]] only ever runs for keys with no value span),
    * so an md5 per row there would be pure write-path tax at corpus
    * scale. String and other non-castable keys NEED the hash — it is
    * their only stat. */
  private def wantsHashStat(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.NumericType => false
    case org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.BooleanType => false
    case _ => true
  }

  /** The stats name a column's per-dir NULL COUNT travels under (the
    * `#h60` convention; '#' cannot collide with the '|'-guarded
    * rendering). Recorded as a degenerate span (n, n) so it rides the
    * existing ColStat format unchanged — a count of 0 is the valuable
    * reading: the dir provably holds no NULL of the column, so an
    * `IS NULL` probe ([[snapshotNulls]]) skips it entirely. Absent
    * (legacy dirs) must scan — conservative, never wrong. */
  private[graft] def nullStatName(c: String): String = s"$c#nulls"

  /** One per-dir statistic: a min/max RANGE of `expr` (the pruning
    * span) or a SUM of it (the null counter) — both collected in the
    * same single in-write metric set. */
  private final case class StatSpec(name: String, expr: Column,
      isSum: Boolean)

  // ---- per-dir Bloom stats (point-predicate skipping) --------------
  // The third stat kind: value spans prune RANGE predicates, hash
  // spans prune string-key merges, but `WHERE url = '…'` on a column
  // the table is hash-clustered by doc_id scans every dir — the
  // takedown-by-URL shape. A per-dir BLOCKED Bloom (256 64-bit words
  // = 2 KB/dir/column; each value sets 4 bits inside ONE word chosen
  // by its portable key hash) closes it: the probe reads the
  // manifest, not the data, and a dir whose word lacks any of the 4
  // bits provably excludes the value. Collected in the SAME in-write
  // Observation pass as every other stat (one bit_or aggregate per
  // word over a once-projected hash column — no second scan), probed
  // driver-side with the same md5-based portable hash, so no Spark
  // job plans just to test membership. False positives only cost
  // I/O (the full predicate re-applies in-plan); saturation (dirs
  // with ≫4k distinct values) degrades to admit-all — conservative,
  // never wrong.
  private[graft] val bloomWords = 256
  private[graft] def bloomStatName(c: String): String = s"$c#bloom"

  /** The (word, 4-bit mask) a VALUE occupies — driver-side twin of
    * the write-side column expressions (same `txkey` md5 hash, same
    * bit fields). `s` is the value's CAST(. AS STRING) rendering,
    * which is exactly what [[keyHash]] hashes. */
  private[graft] def bloomSlot(s: String): (Int, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"txkey:$s".getBytes("UTF-8"))
    var kh = 0L
    var i = 0
    // first 15 hex chars = first 7.5 bytes, matching
    // conv(substring(md5, 1, 15), 16, 10)
    while (i < 7) { kh = (kh << 8) | (md(i) & 0xffL); i += 1 }
    kh = (kh << 4) | ((md(7) & 0xf0L) >> 4)
    val word = (kh % bloomWords).toInt
    var mask = 0L
    var sh = 8
    while (sh <= 26) { mask |= 1L << ((kh >> sh) % 64).toInt; sh += 6 }
    (word, mask)
  }

  /** The write-side 4-bit in-word mask for a row's key hash — the
    * column twin of [[bloomSlot]]'s driver arithmetic. */
  private def bloomMaskExpr(kh: Column): Column =
    Seq(8, 14, 20, 26).map(sh =>
      call_function("shiftleft", lit(1L),
        pmod(shiftright(kh, sh), lit(64L)).cast("int")))
      .reduce((a, b) => a.bitwiseOR(b))

  /** The Bloom columns a writer should record for this table: an
    * explicit per-call list wins (and DECLARES the table-level set);
    * otherwise the table's sticky declaration — filtered to columns
    * the frame actually carries, so evolution/drops degrade to
    * not-recorded rather than erroring. */
  private def effectiveBloomCols(st: LogState, df: DataFrame,
      param: Seq[String] = Seq.empty): Seq[String] =
    (if (param.nonEmpty) param else st.bloomCols)
      .filter(df.columns.contains)

  /** Does `f`'s Bloom for `c` admit the value rendered as `s`?
    * Missing filter admits (legacy/rewritten dirs must scan). */
  private def bloomAdmits(f: AddFile, c: String, s: String): Boolean =
    f.blooms.get(c) match {
      case None => true
      case Some(words) =>
        val (w, mask) = bloomSlot(s)
        w < words.length && (words(w) & mask) == mask
    }

  /** The standard per-column stat set: the value min/max (absent for
    * non-long-castable values — string ids), the portable-hash
    * min/max for non-numeric columns, and the NULL COUNT (every
    * column — `IS NULL` is a predicate class of its own and min/max
    * never answer it) — what every write path records, in ONE
    * in-write metric set. */
  private def statSpecs(df: DataFrame,
      cols: Seq[String]): Seq[StatSpec] =
    cols.flatMap { c =>
      // try_cast, DELIBERATELY (here and at every key-span site): a
      // non-long-castable key (string doc ids) must yield NULL — "no
      // value span, use the hash stat" — under ANSI mode exactly as
      // under permissive mode; a bare cast would throw
      // CAST_INVALID_INPUT the moment a session runs Spark 4's
      // default conf (the r16 ANSI audit caught x170/x171/x173/x174)
      val value = StatSpec(c, col(c).try_cast("long"), isSum = false)
      val nulls = StatSpec(nullStatName(c),
        when(col(c).isNull, lit(1L)).otherwise(lit(0L)), isSum = true)
      if (df.schema.fields.find(_.name == c)
          .forall(f => wantsHashStat(f.dataType)))
        Seq(value, StatSpec(hashStatName(c), keyHash(col(c)),
          isSum = false), nulls)
      else Seq(value, nulls)
    }

  /** Write `df` as a fresh immutable data dir and return its AddFile.
    * Stats (min/max per named column, any number of columns — one
    * metric set, not one pass per column) are collected DURING the
    * write itself (the Observation API — metrics off the rows the
    * write job commits), so an append is exactly ONE pass over the
    * data: the original form re-read the written dir for
    * count/min/max, and parquet aggregate pushdown is off by default,
    * so that read-back was a genuine second scan — 2× write
    * amplification at corpus scale (and a measured +204 ms fixed job
    * cost per append locally, TxAB). */
  private def writeDataDir(spark: SparkSession, root: String,
      df: DataFrame, statsCols: Seq[String],
      cs: Seq[(String, String)],
      bloomCols: Seq[String] = Seq.empty): AddFile = {
    val rel = s"data/${java.util.UUID.randomUUID()}"
    val obs = org.apache.spark.sql.Observation(s"txstats-$rel")
    // value stats prune range reads; hash stats (non-numeric columns
    // only — see wantsHashStat) prune string-key merges — still ONE
    // in-write metric set
    val specs = statSpecs(df, statsCols)
    val metrics = count(lit(1)).as("n") +:
      specs.zipWithIndex.flatMap { case (s, i) =>
        if (s.isSum) Seq(sum(s.expr).as(s"mn$i"))
        else Seq(min(s.expr).as(s"mn$i"), max(s.expr).as(s"mx$i")) }
    // Bloom stats ride the SAME metric set: the portable key hash and
    // the 4-bit in-word mask are projected ONCE per bloom column
    // (below the observe — md5 once per row, not once per word), then
    // each word is one bit_or aggregate over its rows
    val bloomMetrics = bloomCols.zipWithIndex.flatMap { case (_, i) =>
      (0 until bloomWords).map { w =>
        bit_or(when(col(s"__graft_bl_w$i") === w.toLong,
          col(s"__graft_bl_m$i")).otherwise(lit(0L))).as(s"bl${i}_$w")
      }
    }
    // CHECK constraints ride the write's own scan (every writer that
    // lands table rows funnels through here; a violation fails the
    // job before the commit exists). The SET is the caller's capture
    // at snapshot time — its claim loop aborts if a new constraint
    // lands in between (the constraint-vs-writer race)
    val checked = enforced(df, cs)
    val withHelpers = bloomCols.zipWithIndex.foldLeft(checked) {
      case (acc, (c, i)) =>
        val kh = keyHash(col(c))
        acc.withColumn(s"__graft_bl_w$i", pmod(kh, lit(bloomWords.toLong)))
          .withColumn(s"__graft_bl_m$i", bloomMaskExpr(kh))
    }
    val helperNames = bloomCols.indices
      .flatMap(i => Seq(s"__graft_bl_w$i", s"__graft_bl_m$i"))
    val all = metrics ++ bloomMetrics
    checkingConstraints {
      withHelpers.observe(obs, all.head, all.tail: _*)
        .drop(helperNames: _*)
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$rel")
    }
    val m = obs.get
    val stats = specs.zipWithIndex.flatMap { case (s, i) =>
      if (s.isSum)
        m.get(s"mn$i").flatMap(Option(_)).map(_.asInstanceOf[Long])
          .map(v => ColStat(s.name, v, v))
      else for {
        mn <- m.get(s"mn$i").flatMap(Option(_)).map(_.asInstanceOf[Long])
        mx <- m.get(s"mx$i").flatMap(Option(_)).map(_.asInstanceOf[Long])
      } yield ColStat(s.name, mn, mx)
    }
    val blooms = bloomCols.zipWithIndex.map { case (c, i) =>
      c -> Array.tabulate(bloomWords)(w =>
        m.get(s"bl${i}_$w").flatMap(Option(_))
          .map(_.asInstanceOf[Long]).getOrElse(0L))
    }.filter(_._2.exists(_ != 0L)).toMap
    AddFile(rel, m("n").asInstanceOf[Long], stats, blooms = blooms)
  }

  private val MaxClaimRetries = 1000

  /** Dir-count bound for the fused merge hash-stab (the bitmask
    * aggregate in [[mergeCoreOn]]): up to this many hash-statted dirs
    * the interval tests ride the validation aggregate as `bit_or`
    * words (≤ 8 longs, one when-chain per dir — codegen-sized); above
    * it the broadcast interval join ([[hashAdmitted]]) takes over, so
    * a million-dir table never plans a million-branch expression. */
  private val FusedStabMaxDirs = 512

  /** APPEND `df` as one commit. Blind adds commute with every other
    * commit, so claim collisions simply retry at the new head — after
    * re-checking the schema pin (a concurrent [[evolveSchema]] or
    * [[rewrite]] may have changed it; landing an old-generation batch
    * past an evolve would silently revert the pin). The batch must
    * match the table's pinned schema (loud fail BEFORE any write — a
    * drifted producer never lands a byte); [[rewrite]] and
    * [[evolveSchema]] are the sanctioned ways to change the schema.
    * Returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statsCol: Option[String] = None): Long =
    appendCols(spark, root, df, statsCol.toSeq)

  /** [[append]] recording min/max stats for SEVERAL named columns per
    * data dir (one in-write metric set — still exactly one pass), so
    * range reads can prune this dir on any of them
    * ([[snapshotRangeMulti]]). */
  def appendCols(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String], bloomCols: Seq[String] = Seq.empty): Long = {
    val ddl = ddlOf(df)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"append: schema drift on $root — table pins [$p], batch is " +
        s"[$ddl]; an intentional change is a rewrite or evolveSchema, " +
        "not an append"))
    val st0 = foldLog(spark, root, None)
    val bl = effectiveBloomCols(st0, df, bloomCols)
    val add = writeDataDir(spark, root, df, statsCols, st0.constraints,
      bl)
    val bytes = renderManifest("append", Seq(add), Seq.empty,
      statsCols.headOption, Some(ddl),
      bloomColsDecl = Some(bl).filter(_.nonEmpty))
    var attempt = 0
    var v = latestVersion(spark, root) + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"append: could not claim a version after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (p != ddl)
        throw new TxConflictException(
          s"append of $root lost to a concurrent schema change — table " +
            s"now pins [$p], batch is [$ddl]; revalidate and retry"))
      checkNoNewConstraints(spark, root, st0.version, "append")
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** The constraint-vs-writer race check every claim-collision loop
    * runs: this writer's data was validated against the constraint set
    * read at its snapshot (version `v0`) — if a NEW constraint landed
    * since, the already-written data was never checked against it, and
    * claiming past it could land violating rows at head+1 while the
    * constraint reads as live. Abort instead (dropped constraints are
    * harmless: removing a rule cannot make checked data violating). */
  private def checkNoNewConstraints(spark: SparkSession, root: String,
      v0: Long, op: String): Unit = {
    val withCons = commitsInRange(spark, root, v0,
      latestVersion(spark, root)).filter(_.constraints.nonEmpty)
    if (withCons.nonEmpty) throw new TxConflictException(
      s"$op of $root lost v${withCons.map(_.version).min}: an " +
        "intervening commit added a CHECK constraint this writer's " +
        "data was never validated against — retry on a fresh snapshot")
  }

  /** The version that committed `(appId, batchId)`, if any — scans
    * commit manifests newest-first (commits are never deleted, only
    * data dirs vacuum, so the token record is durable). O(commits)
    * worst case when absent; producers that care cache their own
    * high-water mark. */
  def txnVersion(spark: SparkSession, root: String, appId: String,
      batchId: Long): Option[Long] =
    commitNamesBetween(spark, root, 0L, Long.MaxValue).reverseIterator
      .map(readManifest(spark, root, _))
      .collectFirst {
        case c if c.txn.contains((appId, batchId)) => c.version }

  /** The producer `appId`'s HIGH-WATER batch id in this table's log —
    * the replay cursor an idempotent consumer resumes from (the
    * [[graft.streaming.TxStream]] replica derives its start version
    * here instead of re-walking the whole source history every run).
    * O(commits) manifest reads, metadata-sized; None when the
    * producer never committed. Batch ids are assumed monotone per
    * producer (the streaming-sink contract). */
  def lastTxnBatch(spark: SparkSession, root: String,
      appId: String): Option[Long] = {
    val ids = listLog(spark, root).collect { case (_, "commit", n) => n }
      .map(readManifest(spark, root, _))
      .flatMap(_.txn).collect { case (a, b) if a == appId => b }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The strictest retention horizon any [[vacuum]] recorded (None =
    * never vacuumed a referenced dir): versions below it may have had
    * their data dirs reclaimed — the public form of the guard every
    * travel read runs, for consumers (CDC tails, replicas) that need
    * to CLAMP their replay window instead of crashing into it. */
  def retentionHorizon(spark: SparkSession, root: String): Option[Long] =
    foldLog(spark, root, None).gcHorizon.map(_._1)

  /** IDEMPOTENT append — the replay-safe producer contract (Delta's
    * txn/SetTransaction pattern; the sink shape a Structured
    * Streaming `foreachBatch((df, id) => appendIdempotent(..., id))`
    * needs for effectively-once delivery): a batch identified by
    * `(appId, batchId)` commits AT MOST ONCE no matter how many times
    * it is re-delivered. Returns (version, committedNow) — a replay
    * returns the original version with `false` and its already-written
    * data dir is left as a vacuum-reclaimable orphan.
    *
    * Race-closed by the validate-then-claim-head+1 loop: the token
    * check is valid for the head it observed, and the claim targets
    * exactly head+1 — a concurrent commit of the same token either
    * lands at ≤ head (seen by the check) or takes head+1 itself (our
    * claim fails → revalidate). Versions only ever land at head+1, so
    * no same-token commit can slip past both. */
  def appendIdempotent(spark: SparkSession, root: String, df: DataFrame,
      appId: String, batchId: Long,
      statsCol: Option[String] = None): (Long, Boolean) =
    appendIdempotentWithHook(spark, root, df, appId, batchId,
      statsCol)(() => ())

  /** [[appendIdempotent]] with the deterministic interleaving seam the
    * race specs drive (the mergeWithHook pattern): `beforeClaim` runs
    * between the data write and the first claim attempt. */
  private[graft] def appendIdempotentWithHook(spark: SparkSession,
      root: String, df: DataFrame, appId: String, batchId: Long,
      statsCol: Option[String])(beforeClaim: () => Unit): (Long, Boolean) = {
    require(!appId.contains('|') && !appId.contains('\n'),
      s"appendIdempotent: appId must not contain '|' or newlines: $appId")
    txnVersion(spark, root, appId, batchId) match {
      case Some(v) => return (v, false)
      case None =>
    }
    val ddl = ddlOf(df)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"appendIdempotent: schema drift on $root — table pins [$p], " +
        s"batch is [$ddl]"))
    val st0 = foldLog(spark, root, None)
    val add = writeDataDir(spark, root, df, statsCol.toSeq, st0.constraints,
      effectiveBloomCols(st0, df))
    val bytes = renderManifest("append", Seq(add), Seq.empty, statsCol,
      Some(ddl), Some((appId, batchId)))
    beforeClaim()
    var attempt = 0
    while (true) {
      val head = latestVersion(spark, root)
      txnVersion(spark, root, appId, batchId) match {
        case Some(v) => return (v, false) // replay lost the race; dir -> vacuum
        case None =>
      }
      // collision revalidation, same rules as append: a concurrent
      // evolveSchema/rewrite must not be sailed past (landing an
      // old-generation batch would silently revert the pin), and a
      // concurrent addConstraint never validated this batch's rows
      pinnedSchema(spark, root).foreach(p => if (p != ddl)
        throw new TxConflictException(
          s"appendIdempotent of $root lost to a concurrent schema " +
            s"change — table now pins [$p], batch is [$ddl]"))
      checkNoNewConstraints(spark, root, st0.version, "appendIdempotent")
      if (publishIfAbsent(spark, root, manifestName(head + 1, "commit"),
          bytes))
        return (head + 1, true)
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"appendIdempotent: no claim after $MaxClaimRetries tries")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run `body` (one full optimistic attempt: resolve snapshot, write,
    * claim) up to `1 + retries` times, re-running it from scratch on
    * [[TxConflictException]] — Delta's bounded auto-retry loop. Each
    * aborted attempt's orphan data dir is [[vacuum]]-reclaimable; the
    * LAST conflict propagates when the budget is spent. */
  private def withConflictRetry[A](retries: Int)(body: => A): A = {
    var left = math.max(0, retries)
    while (true) {
      try return body
      catch { case _: TxConflictException if left > 0 => left -= 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  /** REWRITE the table: read the current snapshot, write
    * `transform(snapshot)` as fresh dirs, commit a manifest that
    * removes exactly the inputs read. Validation on claim collision:
    * intervening APPENDS survive (only the read inputs are removed);
    * an intervening commit that removed one of our inputs aborts with
    * [[TxConflictException]] (the orphan dir is left for [[vacuum]]).
    * `conflictRetries` > 0 re-resolves a fresh snapshot and re-runs
    * the whole rewrite (transform included) that many times before
    * the conflict propagates. Returns the committed version. */
  def rewrite(spark: SparkSession, root: String,
      statsCol: Option[String] = None, conflictRetries: Int = 0)
      (transform: DataFrame => DataFrame): Long =
    withConflictRetry(conflictRetries) {
      val st0 = foldLog(spark, root, None)
      val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
      require(live0.nonEmpty, s"rewrite: $root has no live data at v$v0")
      val snap = readMasked(spark, root, live0,
        pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
      val out = transform(snap)
      val add = writeDataDir(spark, root, out, statsCol.toSeq,
        st0.constraints, effectiveBloomCols(st0, out))
      val removes = live0.map(_.dir)
      // a rewrite REPLACES the table, so its schema becomes the new pin
      // (the sanctioned schema-change path — Delta's overwriteSchema)
      val bytes = renderManifest("rewrite", Seq(add), removes, statsCol,
        Some(ddlOf(out)))
      claimRewrite(spark, root, "rewrite", v0, removes.toSet, bytes)
    }

  /** Keyed MERGE (upsert) — apply a change batch to the table by key:
    * a batch row REPLACES the live row with its key (or inserts if the
    * key is absent); rows flagged in `deleteCol` (when given) DELETE
    * their key instead. This is the first thing a lakehouse user does
    * after append (the reference's own K5 first-write-wins staging,
    * preprocess_to_staging.py:133-146, is upsert-shaped; Delta's
    * MERGE INTO is the published pattern).
    *
    * The write path is PRUNED BY THE MANIFEST: only live dirs whose
    * recorded min/max FOR `keyCol` intersect the batch's key span (or
    * dirs with no stat on `keyCol`, which might hold anything) are
    * read and rewritten — everything provably key-disjoint stays
    * untouched on disk. STRING keys (doc ids, URLs — no value span)
    * prune through the portable-hash stats instead: the batch's key
    * hashes interval-stab the per-dir hash ranges ([[hashAdmitted]]),
    * so a hash-clustered table ([[optimizeHash]]) localizes a string-
    * key batch exactly as a range-clustered one localizes a long-key
    * batch. Cost = one batch aggregate + one
    * anti-join-sized rewrite of the TOUCHED dirs + the batch write;
    * a well-clustered table ([[appendPartitioned]]/[[optimizeRange]]/
    * [[optimizeHash]]) localizes a narrow-key batch to a few dirs no
    * matter how large the table is.
    *
    * Batch contract: keys non-null and UNIQUE (a key must resolve to
    * one action — checked in the same single batch aggregate); the
    * batch minus `deleteCol` must match the table pin.
    *
    * Concurrency (optimistic, strictest serializable reading): on a
    * claim collision the merge ABORTS ([[TxConflictException]]) if an
    * intervening commit (a) removed one of its touched dirs (same as
    * [[rewrite]]), (b) ADDED data whose `keyCol` stats — value span,
    * refined by hash for string keys — intersect the batch's keys, or
    * carry no `keyCol` stat, since such rows were not merged against,
    * (c) changed the schema pin, (d) added a CHECK constraint this
    * batch was never validated against, or (e) published a tombstone
    * masking a NON-batch row this merge's output carries (committing
    * would resurrect it; a tombstone disjoint from the output — or
    * hitting only upserted batch keys, which re-insert by the
    * documented semantic — commutes). Intervening appends provably
    * key-disjoint survive alongside. `conflictRetries` > 0 re-runs
    * the whole merge on a fresh snapshot that many times before the
    * conflict propagates (Delta's bounded auto-retry).
    * Returns the committed version. */
  def merge(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, deleteCol: Option[String] = None,
      statsCols: Seq[String] = Seq.empty,
      conflictRetries: Int = 0): Long =
    withConflictRetry(conflictRetries) {
      mergeCore(spark, root, batch, keyCol, deleteCol, statsCols,
        None)(() => ())._1
    }

  /** IDEMPOTENT merge — [[appendIdempotent]]'s contract on the MERGE
    * path (the exactly-once streaming-CDC sink shape: a foreachBatch
    * replay must not re-apply a change batch that already landed —
    * re-applying a delete-then-reinsert window would resurrect or
    * double-delete): a merge identified by `(appId, batchId)` commits
    * AT MOST ONCE. Returns (version, committedNow); a replay returns
    * the original version with `false` (its pre-written output dir is
    * a vacuum-reclaimable orphan). Same validate-then-claim-head+1
    * race closure as appendIdempotent, same conflict rules as
    * [[merge]]. */
  def mergeIdempotent(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, appId: String, batchId: Long,
      deleteCol: Option[String] = None,
      statsCols: Seq[String] = Seq.empty,
      conflictRetries: Int = 0): (Long, Boolean) = {
    require(!appId.contains('|') && !appId.contains('\n'),
      s"mergeIdempotent: appId must not contain '|' or newlines: $appId")
    txnVersion(spark, root, appId, batchId) match {
      case Some(v) => (v, false)
      case None => withConflictRetry(conflictRetries) {
        mergeCore(spark, root, batch, keyCol, deleteCol, statsCols,
          Some((appId, batchId)))(() => ())
      }
    }
  }

  /** [[merge]] with a test seam invoked between snapshot resolution
    * and the claim — the deterministic interleaving point the
    * conflict-rule specs drive (the x149 rewrite tests use the
    * transform callback the same way). */
  private[graft] def mergeWithHook(spark: SparkSession, root: String,
      batch: DataFrame, keyCol: String, deleteCol: Option[String],
      statsCols: Seq[String], conflictRetries: Int = 0)
      (beforeClaim: () => Unit): Long =
    withConflictRetry(conflictRetries) {
      mergeCore(spark, root, batch, keyCol, deleteCol, statsCols,
        None)(beforeClaim)._1
    }

  /** The dirs among `files` that can hold at least one key of the
    * keys-only frame `keys`, judged by the PORTABLE-HASH stats: a dir
    * whose recorded hash min/max FOR `keyCol` brackets none of the
    * batch's key hashes is provably key-disjoint and drops out; a dir
    * with no hash stat might hold anything and stays. ONE broadcast
    * interval-stab job — the build side is the manifest-sized dir
    * interval list, the probe side the batch's distinct key hashes,
    * and the collected result is a dir-index set (≤ |files|, metadata-
    * sized). This is what restores write-path pruning for STRING keys
    * (doc ids, URLs), whose value cast yields no span: on a hash-
    * clustered table ([[optimizeHash]]) each dir holds a tight hash
    * range, so a narrow batch stabs few dirs no matter the table
    * size. Exact: a key present in a dir always hashes inside that
    * dir's recorded range (same function both sides); a hash
    * collision only ever ADDS a touched dir. */
  private def hashAdmitted(spark: SparkSession, keys: DataFrame,
      keyCol: String, files: Seq[AddFile]): Seq[AddFile] = {
    val hn = hashStatName(keyCol)
    val (statted, statless) = files.partition(_.statFor(hn).isDefined)
    if (statted.isEmpty) return files
    import spark.implicits._
    val iv = statted.zipWithIndex.map { case (f, i) =>
      val st = f.statFor(hn).get
      (i.toLong, st.min, st.max)
    }.toDF("__di", "__hmn", "__hmx")
    val hit = keys.select(keyHash(col(keyCol)).as("__h")).distinct()
      .join(broadcast(iv),
        col("__h") >= col("__hmn") && col("__h") <= col("__hmx"))
      .select("__di").distinct()
      .collect().map(_.getLong(0)).toSet
    statless ++ statted.zipWithIndex.collect {
      case (f, i) if hit(i.toLong) => f }
  }

  private def mergeCore(spark: SparkSession, root: String,
      batch: DataFrame, keyCol: String, deleteCol: Option[String],
      statsCols: Seq[String], txn: Option[(String, Long)])
      (beforeClaim: () => Unit): (Long, Boolean) = {
    val __dbg = sys.env.contains("GRAFT_MERGE_TIMING")
    var __t0 = System.nanoTime()
    def __tick(l: String): Unit = if (__dbg) { val n = System.nanoTime()
      Console.err.println(f"[mergetiming] $l%-16s ${(n - __t0) / 1e6}%.1f ms"); __t0 = n }
    // MATERIALIZE the change batch once (lazy localCheckpoint, freed in
    // the finally below): the validation aggregate, the hash-prune and
    // the rewrite each consume the batch, and each otherwise re-runs
    // Catalyst analysis AND re-executes the caller's arbitrary source
    // plan — measured 0.99 s -> 0.60 s per merge at sf0.1 on the x170
    // shape, ~2/3 of it repeated planning of the caller's union-of-
    // scans tree. This is also Delta's mergeMaterializeSource rule: a
    // nondeterministic source re-executed per consumer could yield a
    // DIFFERENT key set between validation, prune and write; pinning
    // the rows makes the three views provably consistent. Blocks are
    // batch-sized (a change batch, not the table) and executor-local.
    val batchM = batch.localCheckpoint(eager = false)
    val batchRdd = batchM.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    try {
    mergeCoreOn(spark, root, batchM, keyCol, deleteCol, statsCols,
      txn, __tick)(beforeClaim)
    } finally batchRdd.foreach(_.unpersist(blocking = false))
  }

  /** [[mergeCore]]'s body over the already-materialized batch. */
  private def mergeCoreOn(spark: SparkSession, root: String,
      batch: DataFrame, keyCol: String, deleteCol: Option[String],
      statsCols: Seq[String], txn: Option[(String, Long)],
      __tick: String => Unit)
      (beforeClaim: () => Unit): (Long, Boolean) = {
    val upserts = deleteCol match {
      case Some(d) => batch.where(!coalesce(col(d), lit(false))).drop(d)
      case None => batch
    }
    val ddl = ddlOf(upserts)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"merge: schema drift on $root — table pins [$p], batch is [$ddl]"))
    __tick("pin-check")
    val stats = if (statsCols.isEmpty) Seq(keyCol) else statsCols
    val st0 = foldLog(spark, root, None)
    __tick("foldLog")
    // ONE batch aggregate: size, null-key and unique-key contract, the
    // key span the prune + conflict checks read — AND (for hash-statted
    // keys over a boundedly-dirred table) the hash-stab itself, fused
    // in as per-dir interval-test bitmasks (`bit_or` of 1L<<i words):
    // the separate hashAdmitted action was a distinct + broadcast
    // interval join + collect — three more driver round-trips per merge
    // for the same dir-index set (measured ~0.17 s of the sf0.1 merge
    // floor). Above [[FusedStabMaxDirs]] dirs the when-chain would
    // bloat codegen, so the join path remains the fallback.
    val k = col(keyCol).try_cast("long")
    val hn = hashStatName(keyCol)
    val hashStatted = st0.files.filter(_.statFor(hn).isDefined)
    val fuseStab = batch.schema.fields.find(_.name == keyCol)
      .forall(f => wantsHashStat(f.dataType)) &&
      hashStatted.nonEmpty && hashStatted.size <= FusedStabMaxDirs
    val stabWords = if (fuseStab) (hashStatted.size + 63) / 64 else 0
    val maskAggs = (0 until stabWords).map { w =>
      val bits = (0 until 64).flatMap { b =>
        val i = w * 64 + b
        if (i >= hashStatted.size) None
        else {
          val st = hashStatted(i).statFor(hn).get
          Some(when(col("__h") >= st.min && col("__h") <= st.max,
            lit(1L << b)).otherwise(lit(0L)))
        }
      }.reduce(_.bitwiseOR(_))
      bit_or(bits).as(s"__stab$w")
    }
    val probe =
      if (fuseStab) batch.select(col(keyCol), keyHash(col(keyCol)).as("__h"))
      else batch.select(col(keyCol))
    val aggCols = Seq(count(lit(1)).as("n"), count(col(keyCol)).as("nk"),
      countDistinct(col(keyCol)).as("nd"), min(k).as("mn"),
      max(k).as("mx")) ++ maskAggs
    val r = probe.agg(aggCols.head, aggCols.tail: _*).head()
    __tick("batch-agg")
    require(r.getLong(0) > 0, s"merge: empty batch for $root")
    require(r.getLong(1) == r.getLong(0),
      s"merge: batch has null $keyCol keys")
    require(r.getLong(2) == r.getLong(0),
      s"merge: batch has duplicate $keyCol keys — a key must resolve " +
        "to exactly one action")
    // non-long-castable keys (string ids) have no usable VALUE span —
    // for those the portable-hash stats take over below: the batch's
    // key hashes interval-stab the per-dir hash ranges, so a hash-
    // clustered table still localizes the write to few dirs (the
    // pre-r14 form degenerated to a full-table rewrite here)
    val stringKeyed = r.isNullAt(3)
    val (bmn, bmx) =
      if (stringKeyed) (Long.MinValue, Long.MaxValue)
      else (r.getLong(3), r.getLong(4))
    val hiEx = if (bmx == Long.MaxValue) Long.MaxValue else bmx + 1
    val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
    val touchedBySpan = live0.filter(f => admits(f, keyCol, bmn, hiEx))
    val touched =
      if (!stringKeyed || touchedBySpan.isEmpty) touchedBySpan
      else if (fuseStab) {
        // decode the fused masks — exactly hashAdmitted's result over
        // touchedBySpan: statless dirs stay unconditionally, statted
        // dirs stay iff a batch key hash landed in their interval
        val touchedDirs = touchedBySpan.map(_.dir).toSet
        val hits = (0 until stabWords).flatMap { w =>
          val m = if (r.isNullAt(5 + w)) 0L else r.getLong(5 + w)
          (0 until 64).collect { case b
            if (m & (1L << b)) != 0 => hashStatted(w * 64 + b) }
        }.filter(f => touchedDirs(f.dir))
        touchedBySpan.filter(_.statFor(hn).isEmpty) ++ hits
      } else
        hashAdmitted(spark, batch.select(col(keyCol)), keyCol,
          touchedBySpan)
    __tick("hashAdmitted")
    val out =
      if (touched.isEmpty) upserts // nothing can hold a batch key
      else readMasked(spark, root, touched,
          pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
        .join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(upserts)
    __tick("plan-out")
    val add = writeDataDir(spark, root, out, stats, st0.constraints,
      effectiveBloomCols(st0, out))
    __tick("writeDataDir")
    val removes = touched.map(_.dir)
    val bytes = renderManifest("merge", Seq(add), removes,
      stats.headOption, Some(ddl), txn)
    beforeClaim()
    var attempt = 0
    // claims START at v0+1 (the claimRewrite rule): every commit that
    // landed since snapshot resolution forces a collision, and the
    // collision path is where the conflict rules run — starting at the
    // current head would sail past unvalidated commits
    var v = v0 + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"merge: could not claim a version after $MaxClaimRetries tries")
      txn.foreach { case (appId, batchId) =>
        // a concurrent replay of the SAME token may have landed it —
        // then this attempt is the duplicate and must not commit
        txnVersion(spark, root, appId, batchId) match {
          case Some(tv) => return (tv, false) // dir -> vacuum
          case None =>
        }
      }
      val head = latestVersion(spark, root)
      val inter = commitsInRange(spark, root, v0, head)
      val mine = removes.toSet
      val stolen = inter.filter(_.removes.exists(mine))
      if (stolen.nonEmpty) throw new TxConflictException(
        s"merge of $root lost v${stolen.map(_.version).min}: an " +
          "intervening commit removed one of its touched dirs — retry " +
          "on a fresh snapshot")
      val overlapBySpan = inter.filter(_.adds.exists(a =>
        admits(a, keyCol, bmn, hiEx)))
      // string keys: re-judge the span-suspect adds by hash — an
      // intervening append provably hash-disjoint from the batch keys
      // commutes (same refinement as the write path, collision-only)
      val overlapping =
        if (stringKeyed && overlapBySpan.nonEmpty) {
          val hitDirs = hashAdmitted(spark, batch.select(col(keyCol)),
            keyCol, overlapBySpan.flatMap(_.adds)).map(_.dir).toSet
          overlapBySpan.filter(_.adds.exists(a => hitDirs(a.dir)))
        } else overlapBySpan
      if (overlapping.nonEmpty) throw new TxConflictException(
        s"merge of $root lost v${overlapping.map(_.version).min}: an " +
          s"intervening commit added data that may contain merge keys " +
          s"in [$bmn, $bmx] — retry on a fresh snapshot")
      // intervening tombstones: the pre-r14 rule aborted on ANY. The
      // exact hazard is RESURRECTION — this merge's already-written
      // output postdates the tombstone, so any masked key it carries
      // would silently come back to life. Upserted batch keys are
      // exempt (serialized as tombstone-then-merge, re-insert is the
      // documented semantic); everything else in the output that a new
      // tombstone masks aborts. One scan of our OWN output dir, only
      // on the rare collision+tombstone path.
      val interDvs = inter.flatMap(_.dvs)
      if (interDvs.nonEmpty) {
        val out = spark.read.parquet(s"$root/${add.dir}")
        val resurrects = interDvs.groupBy(_.keyCol).toSeq.sortBy(_._1)
          .exists { case (kc, ds) =>
            !out.columns.contains(kc) || {
              val kt = out.schema(kc).dataType
              val keys = ds.map(dv =>
                  spark.read.parquet(s"$root/${dv.rel}")
                    .select(col(dv.keyCol).cast(kt).as(kc)))
                .reduce(_.unionByName(_)).distinct()
              !out.join(keys, Seq(kc), "left_semi")
                .join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
                .isEmpty
            }
          }
        if (resurrects) throw new TxConflictException(
          s"merge of $root lost " +
            s"v${inter.filter(_.dvs.nonEmpty).map(_.version).min}: an " +
            "intervening tombstone masks non-batch rows this merge " +
            "would rewrite past it (resurrection) — retry on a fresh " +
            "snapshot")
      }
      checkNoNewConstraints(spark, root, v0, "merge")
      pinnedSchema(spark, root).foreach(p => if (p != ddl)
        throw new TxConflictException(
          s"merge of $root lost to a concurrent schema change"))
      v = math.max(head + 1, v + 1)
    }
    (v, true)
  }

  /** Thrown by a write whose rows violate a table CHECK constraint —
    * the violating job fails mid-write (first bad row), so a drifted
    * producer never lands a commit. */
  final class TxConstraintException(msg: String)
    extends RuntimeException(msg)

  /** Wrap `df` so every row is CHECKED against the table's live
    * constraints during whatever job consumes it (the Delta
    * CheckInvariant shape — zero extra passes: the predicate rides the
    * write's own scan). SQL CHECK semantics: NULL satisfies (write
    * `c IS NOT NULL` for NOT NULL). The raise_error carries the
    * constraint name, surfaced via [[TxConstraintException]] by the
    * callers that catch the job failure. */
  private def enforced(df: DataFrame,
      cs: Seq[(String, String)]): DataFrame =
    cs.foldLeft(df) { case (d, (name, e)) =>
      d.filter(when(coalesce(expr(e), lit(true)), lit(true))
        .otherwise(raise_error(concat(
          lit(s"tx constraint '$name' violated: $e — offending row: "),
          to_json(struct(df.columns.map(col).toSeq: _*))))
          .cast("boolean")))
    }

  /** Run `body` (a write job over an [[enforced]] frame), translating
    * the executor-side raise_error into [[TxConstraintException]]. */
  private def checkingConstraints[A](body: => A): A =
    try body catch {
      case e: Throwable =>
        val cause = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(16).find(c => c.getMessage != null &&
            c.getMessage.contains("tx constraint '"))
        cause match {
          case Some(c) => throw new TxConstraintException(c.getMessage)
          case None => throw e
        }
    }

  /** ADD a CHECK constraint: validates the EXISTING data first (one
    * aggregate over the masked snapshot — a constraint that the table
    * already violates is refused with the violation count), then
    * commits the metadata. Every subsequent write enforces it
    * mid-write ([[TxConstraintException]] — the append analogue of
    * the schema pin). On claim collision the snapshot is re-validated
    * (a commit may have landed rows the first validation never saw).
    * Returns the committed version. */
  def addConstraint(spark: SparkSession, root: String, name: String,
      exprSql: String): Long = {
    require(!name.contains('|') && !name.contains('\n') &&
      !exprSql.contains('\n'),
      s"addConstraint: name must not contain '|'; no newlines: $name")
    var attempt = 0
    while (true) {
      val st = foldLog(spark, root, None)
      require(st.version > 0, s"addConstraint: $root has no commits")
      val snap = snapshot(spark, root, Some(st.version))
      val bad = snap.where(!coalesce(expr(exprSql), lit(true))).count()
      if (bad > 0) throw new TxConstraintException(
        s"addConstraint '$name' on $root: $bad existing rows violate " +
          s"[$exprSql] — clean the data (merge/rewrite) before pinning")
      val bytes = renderManifest("constrain", Seq.empty, Seq.empty, None,
        pinnedSchemaAt(spark, root, st.version),
        constraints = Seq((name, exprSql)))
      if (publishIfAbsent(spark, root,
          manifestName(st.version + 1, "commit"), bytes))
        return st.version + 1
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"addConstraint: no claim after $MaxClaimRetries tries")
      // loop: re-validate against whatever landed meanwhile
    }
    throw new IllegalStateException("unreachable")
  }

  /** DROP a CHECK constraint by name (metadata commit). */
  def dropConstraint(spark: SparkSession, root: String,
      name: String): Long = {
    val st = foldLog(spark, root, None)
    require(st.constraints.exists(_._1 == name),
      s"dropConstraint: no constraint '$name' on $root " +
        s"(live: ${st.constraints.map(_._1).mkString(", ")})")
    val bytes = renderManifest("constrain", Seq.empty, Seq.empty, None,
      pinnedSchemaAt(spark, root, st.version),
      dropConstraints = Seq(name))
    var attempt = 0
    var v = st.version + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"dropConstraint: no claim after $MaxClaimRetries tries")
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** Keyed DELETE — [[merge]]'s delete-only form from a KEYS-ONLY
    * frame (the takedown shape: a churn list names ids, not rows):
    * removes every row whose key appears in `keys`, rewriting only
    * the dirs whose manifest stats admit the key span. The delete
    * batch is synthesized against the pin (non-key columns as typed
    * nulls — they never land), and keys are de-duplicated here since
    * a churn list is a set, not a change log. Returns the committed
    * version. */
  def mergeDelete(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, conflictRetries: Int = 0): Long = {
    val pin = pinnedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"mergeDelete: $root has no schema pin (legacy log) — use " +
          "rewrite on pre-pin tables"))
    val t = org.apache.spark.sql.types.StructType.fromDDL(pin)
    require(t.fieldNames.contains(keyCol),
      s"mergeDelete: $keyCol is not a pinned column of $root [$pin]")
    val batch = keys.select(col(keyCol)).distinct().select(
      t.fields.map { f =>
        if (f.name == keyCol) col(keyCol).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq :+ lit(true).as("__del"): _*)
    merge(spark, root, batch, keyCol, deleteCol = Some("__del"),
      conflictRetries = conflictRetries)
  }

  /** PREDICATE DELETE — remove every live row matching `cond`,
    * rewriting ONLY the dirs that can hold one (the row-level-DML
    * half of the SQL door: `DELETE FROM t WHERE …` lowers here).
    * `bounds` are per-column `[lo, hi)` intervals that `cond` IMPLIES
    * (the SQL rule derives them from the predicate's conjunctive
    * long comparisons, [[graft.sources.TxBounds]]-style): a dir whose
    * recorded stats exclude every bound provably holds no matching
    * row and is neither read NOR rewritten — write-path pruning, so
    * the bounds are correctness-relevant and a caller who cannot
    * prove the implication passes `Seq.empty` (every dir touched,
    * always sound). Unlike [[mergeDelete]] this is exact under
    * duplicate keys (it filters rows, not key sets) and takes any
    * predicate. Tombstone masks apply before the filter (a masked
    * row stays deleted); same optimistic conflict rules as [[merge]]
    * — intervening adds inside the bounds, stolen dirs, new
    * tombstones, new constraints and pin changes all abort, and
    * `conflictRetries` re-runs bounded. Returns the committed
    * version (the CURRENT version when the bounds prove no dir could
    * match — a provable no-op commits nothing). */
  def deleteWhere(spark: SparkSession, root: String, cond: Column,
      bounds: Seq[(String, Long, Long)] = Seq.empty,
      conflictRetries: Int = 0): Long =
    // Keep rows where cond is NOT TRUE. Under three-valued logic a
    // NULL predicate (e.g. `score > 5` on a NULL score) must KEEP the
    // row — SQL DELETE removes only rows where the predicate is TRUE
    // — so the kept-set filter is !coalesce(cond, false), never !cond
    // (whose NULL would silently delete the row).
    rewriteWhere(spark, root, "delete", bounds, conflictRetries)(
      df => df.where(!coalesce(cond, lit(false))))

  /** PREDICATE UPDATE — set `set`'s columns (cast to their pinned
    * types; schema never changes) on every live row matching `cond`,
    * rewriting only the dirs the `bounds` admit (`UPDATE t SET …
    * WHERE …` lowers here; the bounds contract, conflict rules and
    * return value are [[deleteWhere]]'s). */
  def updateWhere(spark: SparkSession, root: String,
      set: Seq[(String, Column)], cond: Column,
      bounds: Seq[(String, Long, Long)] = Seq.empty,
      conflictRetries: Int = 0): Long = {
    require(set.nonEmpty, "updateWhere: no assignments")
    rewriteWhere(spark, root, "update", bounds, conflictRetries) { df =>
      val byName = set.toMap
      byName.keys.foreach(c => require(df.columns.contains(c),
        s"updateWhere: '$c' is not a column of $root " +
          s"[${df.columns.mkString(", ")}]"))
      df.select(df.columns.toSeq.map { c =>
        byName.get(c) match {
          case Some(e) =>
            when(cond, e.cast(df.schema(c).dataType)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    }
  }

  /** The shared predicate-DML core: read the touched dirs masked,
    * transform, commit the swap under merge-grade validation. */
  private def rewriteWhere(spark: SparkSession, root: String,
      action: String, bounds: Seq[(String, Long, Long)],
      conflictRetries: Int)
      (transform: DataFrame => DataFrame): Long =
    withConflictRetry(conflictRetries) {
      val st0 = foldLog(spark, root, None)
      require(st0.version > 0, s"$action: $root has no commits")
      def admitted(f: AddFile) =
        bounds.forall { case (c, lo, hi) => admits(f, c, lo, hi) }
      val touched = st0.files.filter(admitted)
      if (touched.isEmpty) return st0.version // provably nothing to do
      val pin = pinnedSchemaAt(spark, root, st0.version)
      val in = readMasked(spark, root, touched, pin, st0.dvs,
        st0.clones, st0.evos)
      val out = transform(in)
      require(ddlOf(out) == ddlOf(in),
        s"$action: the transform changed the schema — [${ddlOf(in)}] " +
          s"to [${ddlOf(out)}]; predicate DML never moves the pin")
      val statsCols = statsColumn(spark, root).toSeq
      val add = writeDataDir(spark, root, out, statsCols, st0.constraints,
        effectiveBloomCols(st0, out))
      val removes = touched.map(_.dir)
      // deleting every row of every touched dir needs no add at all
      // (the 0-row dir is left as a vacuum-reclaimable orphan)
      val adds = if (add.rows == 0L) Seq.empty else Seq(add)
      val bytes = renderManifest(action, adds, removes,
        statsCols.headOption, pin)
      var attempt = 0
      var v = st0.version + 1
      while (!publishIfAbsent(spark, root, manifestName(v, "commit"),
          bytes)) {
        attempt += 1
        if (attempt > MaxClaimRetries) throw new java.io.IOException(
          s"$action: could not claim a version after $MaxClaimRetries tries")
        val head = latestVersion(spark, root)
        val inter = commitsInRange(spark, root, st0.version, head)
        val mine = removes.toSet
        val stolen = inter.filter(_.removes.exists(mine))
        if (stolen.nonEmpty) throw new TxConflictException(
          s"$action of $root lost v${stolen.map(_.version).min}: an " +
            "intervening commit removed one of its touched dirs — " +
            "retry on a fresh snapshot")
        // rows added since the snapshot were never filtered/updated;
        // committing past an add the bounds admit would silently skip
        // them (this commit serializes AFTER the add)
        val overlapping = inter.filter(_.adds.exists(admitted))
        if (overlapping.nonEmpty) throw new TxConflictException(
          s"$action of $root lost v${overlapping.map(_.version).min}: " +
            "an intervening commit added data inside the predicate's " +
            "bounds — retry on a fresh snapshot")
        // an intervening tombstone's mask would be erased for the
        // touched dirs (this output postdates it) — same rule as
        // rewrite/merge
        val tomb = inter.filter(_.dvs.nonEmpty)
        if (tomb.nonEmpty) throw new TxConflictException(
          s"$action of $root lost v${tomb.map(_.version).min}: an " +
            s"intervening tombstone masks rows this $action read — " +
            "retry on a fresh snapshot")
        checkNoNewConstraints(spark, root, st0.version, action)
        pinnedSchemaAt(spark, root, head).foreach(p =>
          if (pin.exists(_ != p)) throw new TxConflictException(
            s"$action of $root lost to a concurrent schema change"))
        v = math.max(head + 1, v + 1)
      }
      v
    }

  /** Key TOMBSTONE (deletion vector) — the takedown write path that
    * costs KILOBYTES instead of a rewrite: publish a key list; every
    * subsequent snapshot masks rows whose key matches in any dir that
    * PREDATES the tombstone (rows inserted after it live — re-insert
    * is the resurrection semantic, exactly [[merge]]'s). At 100 TB
    * this is the difference between a GDPR takedown rewriting
    * terabytes ([[mergeDelete]]'s touched-dir rewrite) and writing a
    * key file: data dirs stay byte-identical, the mask applies at
    * read time (one anti-join against the takedown-sized key set,
    * broadcast at scale), and the next [[rewrite]]/[[optimizeRange]]
    * materializes the mask physically (they read the masked snapshot;
    * their outputs postdate every prior tombstone, making it inert —
    * the fold then drops it and vacuum reclaims the key dir).
    * Published pattern: Delta deletion vectors / Iceberg equality
    * deletes, reduced to the key-equality case.
    *
    * Commutes with appends and other tombstones (blind claim retry,
    * pin re-checked); [[rewrite]]/[[optimizeRange]]/[[merge]] ABORT if
    * a tombstone intervenes mid-flight (their outputs would silently
    * erase the new mask). Returns the committed version. */
  def tombstone(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String): Long = {
    val head = latestVersion(spark, root)
    require(head > 0, s"tombstone: $root has no commits")
    val pin = pinnedSchema(spark, root)
    require(pin.isDefined,
      s"tombstone: $root has no schema pin (legacy log) — rewrite once " +
        "to establish one")
    pin.foreach(p => require(
      org.apache.spark.sql.types.StructType.fromDDL(p)
        .fieldNames.contains(keyCol),
      s"tombstone: $keyCol is not a pinned column of $root [$p]"))
    val rel = s"data/${java.util.UUID.randomUUID()}"
    val obs = org.apache.spark.sql.Observation(s"txdv-$rel")
    keys.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$rel")
    require(obs.get("n").asInstanceOf[Long] > 0,
      s"tombstone: no non-null $keyCol keys in the batch (the empty " +
        "key dir is left as a vacuum-reclaimable orphan)")
    val bytes = renderManifest("tombstone", Seq.empty, Seq.empty, None,
      pin, None, Seq(Tombstone(rel, keyCol, 0L)))
    var attempt = 0
    var v = head + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"tombstone: no claim after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (!pin.contains(p))
        throw new TxConflictException(
          s"tombstone of $root lost to a concurrent schema change"))
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** EVOLVE the table schema — the explicit, additive half of the
    * schema story (the pin stays the default: accidental drift is a
    * loud error; evolution is a deliberate commit). Permitted: ADD
    * COLUMN (any position; old rows read as typed nulls) and WIDENING
    * an existing column (byte→short→int→long, float→double — lossless
    * casts only). Dropping or renaming is a [[rewrite]]. Reference
    * anchor: the reference's gold schema is dynamic by design — a new
    * pollutant column arriving (process_to_curated.py:42,76-78) is the
    * system's normal evolution event, not an error.
    *
    * The commit carries no adds/removes — it only moves the pin.
    * Readers align every older-generation dir to the new pin at scan
    * time ([[readAligned]]); time travel to a pre-evolution version
    * still reads the old schema. Appends after the evolve must match
    * the NEW pin. Returns the committed version. */
  def evolveSchema(spark: SparkSession, root: String,
      newDdl: String): Long = {
    import org.apache.spark.sql.types._
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    val head = latestVersion(spark, root)
    require(head > 0,
      s"evolveSchema: $root has no commits — the founding append pins")
    val oldDdl = pinnedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"evolveSchema: $root has no schema pin (legacy log) — rewrite " +
          "once to establish one"))
    val norm = ddlNorm(newDdl)
    require(norm != ddlNorm(oldDdl), "evolveSchema: schema unchanged")
    val oldT = StructType.fromDDL(oldDdl)
    val newT = StructType.fromDDL(norm)
    oldT.fields.foreach { f =>
      val nf = newT.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"evolveSchema: drops column ${f.name} — evolution is " +
            "additive/widening only; dropping or renaming is a rewrite"))
      require(widens(f.dataType, nf.dataType),
        s"evolveSchema: ${f.name} ${f.dataType.simpleString} → " +
          s"${nf.dataType.simpleString} is not a lossless widening")
    }
    val bytes = renderManifest("evolve", Seq.empty, Seq.empty, None,
      Some(norm))
    var attempt = 0
    var v = head + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"evolveSchema: no claim after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (ddlNorm(p) != ddlNorm(oldDdl))
        throw new TxConflictException(
          s"evolveSchema of $root lost to a concurrent schema change — " +
            s"pin is now [$p]; revalidate the evolution against it"))
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** RENAME a column — METADATA ONLY, no data bytes move (the Delta
    * column-mapping move, expressed as a versioned name-lineage
    * record instead of field ids): the commit re-pins the schema with
    * the new name and records `rename from|to`; readers map each
    * older generation's physical name forward through the records
    * ([[lineage]]), so mixed-generation snapshots, travel reads and
    * tombstone masks (a takedown published under the old name keeps
    * masking) all keep working. New writes must use the new name (the
    * schema pin enforces it). Stats recorded under the old name stop
    * pruning reads on the new name — conservative, never wrong; the
    * next optimize/compact re-records them. Refused while a live
    * CHECK constraint mentions the column (the constraint text would
    * silently stop matching rows). */
  def renameColumn(spark: SparkSession, root: String, from: String,
      to: String): Long = {
    import org.apache.spark.sql.types._
    require(from != to, s"renameColumn: '$from' to itself")
    require(!Seq(from, to).exists(c => c.contains('|') || c.contains('\n')),
      "renameColumn: names must not contain '|' or newlines")
    var attempt = 0
    while (true) {
      val head = latestVersion(spark, root)
      require(head > 0, s"renameColumn: $root has no commits")
      val pin = pinnedSchema(spark, root).getOrElse(
        throw new IllegalStateException(
          s"renameColumn: $root has no schema pin (legacy log)"))
      val oldT = StructType.fromDDL(pin)
      require(oldT.fieldNames.contains(from),
        s"renameColumn: no column '$from' in [$pin]")
      require(!oldT.fieldNames.contains(to),
        s"renameColumn: '$to' already exists in [$pin]")
      constraintMentions(spark, root, from).foreach(n =>
        throw new IllegalArgumentException(
          s"renameColumn: constraint '$n' references '$from' — drop or " +
            "re-state the constraint first"))
      val newT = StructType(oldT.fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      val newStats = statsColumn(spark, root)
        .map(c => if (c == from) to else c)
      // the sticky Bloom declaration follows the rename (filters
      // recorded under the OLD name stop answering — conservative —
      // but NEW writes keep recording under the new name instead of
      // the declaration silently detaching)
      val bl = foldLog(spark, root, None).bloomCols
      val bytes = renderManifest("rename", Seq.empty, Seq.empty, newStats,
        Some(ddlNorm(newT.toDDL)), evos = Seq((0L, "rename", from, to)),
        bloomColsDecl = Some(bl.map(c => if (c == from) to else c))
          .filter(_.nonEmpty))
      if (publishIfAbsent(spark, root, manifestName(head + 1, "commit"),
          bytes))
        return head + 1
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"renameColumn: no claim after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (ddlNorm(p) != ddlNorm(pin))
        throw new TxConflictException(
          s"renameColumn of $root lost to a concurrent schema change — " +
            s"pin is now [$p]"))
    }
    throw new IllegalStateException("unreachable")
  }

  /** DROP a column — METADATA ONLY: the commit re-pins the narrower
    * schema and records `drop name`; the bytes stay in old files but
    * no live logical column owns them, and a LATER re-add of the same
    * name is a fresh lineage that reads null over old generations —
    * never the dropped bytes (the [[lineage]] break). Refused for the
    * last column and while a live CHECK constraint mentions it. */
  def dropColumn(spark: SparkSession, root: String,
      name: String): Long = {
    import org.apache.spark.sql.types._
    require(!name.contains('|') && !name.contains('\n'),
      "dropColumn: name must not contain '|' or newlines")
    var attempt = 0
    while (true) {
      val head = latestVersion(spark, root)
      require(head > 0, s"dropColumn: $root has no commits")
      val pin = pinnedSchema(spark, root).getOrElse(
        throw new IllegalStateException(
          s"dropColumn: $root has no schema pin (legacy log)"))
      val oldT = StructType.fromDDL(pin)
      require(oldT.fieldNames.contains(name),
        s"dropColumn: no column '$name' in [$pin]")
      require(oldT.fields.length > 1,
        s"dropColumn: '$name' is the only column of $root")
      constraintMentions(spark, root, name).foreach(n =>
        throw new IllegalArgumentException(
          s"dropColumn: constraint '$n' references '$name' — drop the " +
            "constraint first"))
      // refused while a LIVE tombstone keys on the column (judged by
      // the tombstone key's HEAD name — takedowns published under a
      // pre-rename name still count): the drop ends the key's lineage,
      // so every later snapshot's mask would resolve against a column
      // the schema no longer carries (read-path crash), and a later
      // re-ADD of the same name would anti-join a fresh lineage that
      // reads NULL over old generations — silently losing the takedown
      // mask, a compliance hole. Materializing the mask first makes
      // the tombstone inert and the drop safe.
      val stDv = foldLog(spark, root, None)
      stDv.dvs.find(dv =>
          lineage(stDv.evos, dv.version, dv.keyCol).contains(name))
        .foreach(dv => throw new IllegalArgumentException(
          s"dropColumn: a live tombstone (v${dv.version}, key " +
            s"'${dv.keyCol}') masks rows by '$name' — dropping the " +
            "column would orphan the mask (reads crash now; a re-add " +
            "would silently lose the takedown). Materialize the mask " +
            "first (rewrite/optimizeCompact/optimizeRange), then drop."))
      val newT = StructType(oldT.fields.filterNot(_.name == name))
      val newStats = statsColumn(spark, root).filterNot(_ == name)
      // a dropped column leaves the sticky Bloom declaration too
      val blDrop = foldLog(spark, root, None).bloomCols
      val bytes = renderManifest("dropcol", Seq.empty, Seq.empty, newStats,
        Some(ddlNorm(newT.toDDL)), evos = Seq((0L, "drop", name, "")),
        bloomColsDecl = Some(blDrop.filterNot(_ == name))
          .filter(_ => blDrop.contains(name)))
      if (publishIfAbsent(spark, root, manifestName(head + 1, "commit"),
          bytes))
        return head + 1
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"dropColumn: no claim after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (ddlNorm(p) != ddlNorm(pin))
        throw new TxConflictException(
          s"dropColumn of $root lost to a concurrent schema change — " +
            s"pin is now [$p]"))
    }
    throw new IllegalStateException("unreachable")
  }

  /** The live CHECK constraints whose expression TEXT mentions
    * `column` as a word — the conservative guard rename/drop use (a
    * false positive refuses and asks the operator to re-state; a miss
    * would silently decouple the constraint from its data). */
  private def constraintMentions(spark: SparkSession, root: String,
      column: String): Option[String] = {
    val re = ("(?<![A-Za-z0-9_`])" + java.util.regex.Pattern.quote(column) +
      "(?![A-Za-z0-9_`])").r
    constraints(spark, root).collectFirst {
      case (n, e) if re.findFirstIn(e).isDefined => n
    }
  }

  /** APPEND with clustered partitioning: the batch lands as one
    * commit of `buckets` dirs, each its own AddFile with tight stats —
    * so reads and merges prune within this batch from the moment it
    * lands, instead of waiting for the next [[optimizeRange]]/
    * [[optimizeHash]] (a plain append's single dir spans whatever
    * keys the batch carried). Long-castable keys bucket by fixed-width
    * VALUE ranges derived from this batch's span (range reads prune);
    * string keys bucket by fixed-width ranges of the portable key
    * HASH — the [[optimizeHash]] layout per batch, so a string-keyed
    * intake is [[merge]]-prunable from day one (a K-key merge stabs
    * ≤K buckets per batch instead of rewriting every batch whole).
    * Costs one extra pass over the BATCH for the per-bucket stats
    * (plain [[append]] stays one-pass via in-write observation); same
    * blind-add concurrency as [[append]]. */
  def appendPartitioned(spark: SparkSession, root: String, df: DataFrame,
      keyCol: String, buckets: Int,
      extraStats: Seq[String] = Seq.empty): Long = {
    require(buckets >= 1,
      s"appendPartitioned: buckets must be >= 1, got $buckets")
    val ddl = ddlOf(df)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"appendPartitioned: schema drift on $root — table pins [$p], " +
        s"batch is [$ddl]"))
    val r = df.agg(min(col(keyCol).try_cast("long")),
      max(col(keyCol).try_cast("long")), count(lit(1))).head()
    require(r.getLong(2) > 0, s"appendPartitioned: empty batch for $root")
    val bucket =
      if (r.isNullAt(0)) {
        // no value span (string ids) — fixed-width hash ranges; null
        // keys hash as the empty draw and cluster together
        val width = math.max(1L, (HashSpace + buckets - 1) / buckets)
        (keyHash(col(keyCol)) / width).cast("long")
      } else {
        val (mn, mx) = (r.getLong(0), r.getLong(1))
        val width = math.max(1L, (mx - mn + buckets) / buckets)
        coalesce(
          ((col(keyCol).try_cast("long") - mn) / width).cast("long"), lit(0L))
      }
    val rel = s"data/${java.util.UUID.randomUUID()}"
    val st0 = foldLog(spark, root, None)
    checkingConstraints {
      enforced(df, st0.constraints).withColumn("__b", bucket)
        .repartition(col("__b"))
        .write.mode(SaveMode.ErrorIfExists)
        .partitionBy("__b").parquet(s"$root/$rel")
    }
    val stats = bucketStats(df, bucket,
      statSpecs(df, keyCol +: extraStats), effectiveBloomCols(st0, df))
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, cs, bl) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, cs, blooms = bl)
      }
    val bytes = renderManifest("append", adds, Seq.empty, Some(keyCol),
      Some(ddl))
    var attempt = 0
    var v = latestVersion(spark, root) + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"appendPartitioned: no claim after $MaxClaimRetries tries")
      pinnedSchema(spark, root).foreach(p => if (p != ddl)
        throw new TxConflictException(
          s"appendPartitioned of $root lost to a concurrent schema " +
            s"change — table now pins [$p], batch is [$ddl]"))
      checkNoNewConstraints(spark, root, st0.version, "appendPartitioned")
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** Per-bucket (count, per-stat min/max) in ONE grouped aggregate —
    * shared by [[appendPartitioned]]/[[optimizeRange]]/
    * [[optimizeZOrder]]/[[optimizeHash]]; never a per-dir re-scan. */
  private def bucketStats(df: DataFrame, bucket: Column,
      specs: Seq[StatSpec], bloomCols: Seq[String] = Seq.empty)
      : Map[Long, (Long, Seq[ColStat], Map[String, Array[Long]])] = {
    val aggs = count(lit(1)).as("n") +: (specs.zipWithIndex.flatMap {
      case (s, i) =>
        if (s.isSum) Seq(sum(s.expr).as(s"mn$i"))
        else Seq(min(s.expr).as(s"mn$i"), max(s.expr).as(s"mx$i")) } ++
      // per-bucket Blooms ride the SAME grouped aggregate: one
      // bit_or per word over the once-projected hash/mask helpers
      bloomCols.indices.flatMap(i => (0 until bloomWords).map(w =>
        bit_or(when(col(s"__blw$i") === w.toLong, col(s"__blm$i"))
          .otherwise(lit(0L))).as(s"bl${i}_$w"))))
    val withHelpers = bloomCols.zipWithIndex.foldLeft(
      df.withColumn("__b", bucket)) { case (acc, (c, i)) =>
        val kh = keyHash(col(c))
        acc.withColumn(s"__blw$i", pmod(kh, lit(bloomWords.toLong)))
          .withColumn(s"__blm$i", bloomMaskExpr(kh))
      }
    withHelpers.groupBy("__b")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val cs = specs.zipWithIndex.flatMap { case (s, i) =>
          val mnI = r.fieldIndex(s"mn$i")
          if (s.isSum) {
            if (r.isNullAt(mnI)) None
            else Some(ColStat(s.name, r.getLong(mnI), r.getLong(mnI)))
          } else {
            val mxI = r.fieldIndex(s"mx$i")
            if (r.isNullAt(mnI) || r.isNullAt(mxI)) None
            else Some(ColStat(s.name, r.getLong(mnI), r.getLong(mxI)))
          }
        }
        val bl = bloomCols.zipWithIndex.map { case (c, i) =>
          c -> Array.tabulate(bloomWords) { w =>
            val fi = r.fieldIndex(s"bl${i}_$w")
            if (r.isNullAt(fi)) 0L else r.getLong(fi)
          }
        }.filter(_._2.exists(_ != 0L)).toMap
        r.getLong(0) -> ((r.getLong(1), cs, bl))
      }.toMap
  }

  /** OPTIMIZE with RANGE partitioning — the maintenance rewrite that
    * RESTORES manifest-stats granularity: appends land dirs in
    * arrival order (each spanning whatever keys the batch carried)
    * and a plain [[rewrite]] collapses everything into ONE dir, so
    * either way [[snapshotRange]] eventually prunes nothing. This
    * rewrite re-clusters the snapshot into `buckets` fixed-width key
    * ranges — ONE pass, one shuffle (`repartition` on the bucket,
    * `partitionBy` write) — and commits every bucket as its OWN
    * AddFile with tight min/max, so range reads prune again. Null
    * keys ride in bucket 0. Same optimistic validation as [[rewrite]]
    * (concurrent appends survive; input theft aborts). Returns the
    * committed version. */
  def optimizeRange(spark: SparkSession, root: String, keyCol: String,
      buckets: Int, extraStats: Seq[String] = Seq.empty): Long = {
    require(buckets >= 1, s"optimizeRange: buckets must be >= 1, got $buckets")
    val st0 = foldLog(spark, root, None)
    val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
    require(live0.nonEmpty, s"optimizeRange: $root has no live data at v$v0")
    val snap = readMasked(spark, root, live0,
      pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
    val r = snap.agg(min(col(keyCol).try_cast("long")),
      max(col(keyCol).try_cast("long"))).head()
    require(!r.isNullAt(0),
      s"optimizeRange: $keyCol has no non-null values in $root")
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (mx - mn + buckets) / buckets) // ceil((mx-mn+1)/B)
    val bucket = coalesce(
      ((col(keyCol).try_cast("long") - mn) / width).cast("long"), lit(0L))
    val rel = s"data/${java.util.UUID.randomUUID()}"
    snap.withColumn("__b", bucket)
      .repartition(col("__b"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__b").parquet(s"$root/$rel")
    // one AddFile per nonempty bucket — stats from ONE grouped
    // aggregate over the snapshot (identical rows to what each bucket
    // dir just received), not B per-dir re-scans
    val stats = bucketStats(snap, bucket,
      statSpecs(snap, keyCol +: extraStats), effectiveBloomCols(st0, snap))
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, cs, bl) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, cs, blooms = bl)
      }
    val removes = live0.map(_.dir)
    val bytes = renderManifest("rewrite", adds, removes, Some(keyCol),
      Some(ddlOf(snap)))
    claimRewrite(spark, root, "optimizeRange", v0, removes.toSet, bytes)
  }

  /** OPTIMIZE with Z-ORDER clustering — the TWO-dimensional
    * maintenance rewrite ([[optimizeRange]]'s companion; the lake
    * `OPTIMIZE ZORDER BY` on this commit log): re-cluster the masked
    * snapshot into `buckets` fixed-width ranges of the Morton
    * interleave of `xCol` and `yCol` ([[ZOrder.interleave16]] — exact
    * codegen'd bit algebra), each bucket its OWN AddFile carrying
    * min/max stats for BOTH dimensions. Because a z-range is a
    * compact rectangle-ish region of the plane, both per-bucket stat
    * ranges are tight — so [[snapshotRangeMulti]] box reads prune on
    * EITHER OR BOTH dims (a single-key layout's second-dim stats span
    * its whole domain and prune nothing). One pass, one shuffle, an
    * in-partition z sort for row-group-level stats below the manifest.
    * Null dims ride in bucket 0. Same optimistic validation as
    * [[rewrite]]. Returns the committed version. */
  def optimizeZOrder(spark: SparkSession, root: String, xCol: String,
      yCol: String, buckets: Int): Long = {
    require(buckets >= 1,
      s"optimizeZOrder: buckets must be >= 1, got $buckets")
    val st0 = foldLog(spark, root, None)
    val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
    require(live0.nonEmpty, s"optimizeZOrder: $root has no live data at v$v0")
    val snap = readMasked(spark, root, live0,
      pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
    val zc = ZOrder.interleave16(col(xCol), col(yCol))
    val r = snap.agg(min(zc), max(zc)).head()
    require(!r.isNullAt(0),
      s"optimizeZOrder: ($xCol, $yCol) has no fully non-null rows in $root")
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (mx - mn + buckets) / buckets)
    val bucket = coalesce(((zc - mn) / width).cast("long"), lit(0L))
    val rel = s"data/${java.util.UUID.randomUUID()}"
    snap.withColumn("__b", bucket)
      .repartition(col("__b"))
      .sortWithinPartitions(col("__b"), zc)
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__b").parquet(s"$root/$rel")
    val stats = bucketStats(snap, bucket,
      statSpecs(snap, Seq(xCol, yCol)), effectiveBloomCols(st0, snap))
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, cs, bl) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, cs, blooms = bl)
      }
    val removes = live0.map(_.dir)
    val bytes = renderManifest("rewrite", adds, removes, Some(xCol),
      Some(ddlOf(snap)))
    claimRewrite(spark, root, "optimizeZOrder", v0, removes.toSet, bytes)
  }

  /** OPTIMIZE with HASH clustering — what makes STRING-keyed merges
    * prune ([[optimizeRange]]'s companion for keys with no value
    * order): re-cluster the masked snapshot into `buckets` fixed-width
    * ranges of the PORTABLE KEY HASH ([[keyHash]] — md5-60, uniform in
    * [0, 2^60)), each bucket its own AddFile whose recorded hash
    * min/max is tight by construction. A later [[merge]] on `keyCol`
    * with string keys interval-stabs these ranges ([[hashAdmitted]])
    * and rewrites only the stabbed buckets — a narrow batch touches
    * ~|batch| buckets out of B no matter the table size, exactly the
    * long-key story one hash away. (Value-range reads on a hash
    * layout prune nothing, and vice versa — pick the layout for the
    * write pattern; doc-id/URL-keyed corpus tables merge far more
    * often than they range-scan.) One pass, one shuffle; null keys
    * hash as the empty draw and cluster together. Same optimistic
    * validation as [[rewrite]]. Returns the committed version. */
  def optimizeHash(spark: SparkSession, root: String, keyCol: String,
      buckets: Int, extraStats: Seq[String] = Seq.empty): Long = {
    require(buckets >= 1,
      s"optimizeHash: buckets must be >= 1, got $buckets")
    val __dbg = sys.env.contains("GRAFT_MERGE_TIMING")
    var __t0 = System.nanoTime()
    def __tick(l: String): Unit = if (__dbg) { val n = System.nanoTime()
      Console.err.println(f"[ohtiming] $l%-16s ${(n - __t0) / 1e6}%.1f ms"); __t0 = n }
    val st0 = foldLog(spark, root, None)
    val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
    require(live0.nonEmpty, s"optimizeHash: $root has no live data at v$v0")
    val snap = readMasked(spark, root, live0,
      pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
    __tick("snap-build")
    val width = math.max(1L, (HashSpace + buckets - 1) / buckets)
    val bucket = (keyHash(col(keyCol)) / width).cast("long")
    val rel = s"data/${java.util.UUID.randomUUID()}"
    snap.withColumn("__b", bucket)
      .repartition(col("__b"))
      .sortWithinPartitions(col("__b"), keyHash(col(keyCol)))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__b").parquet(s"$root/$rel")
    __tick("write")
    // the key's HASH span is this layout's whole point — force it even
    // for a numeric key the type gate would otherwise skip
    val specs0 = statSpecs(snap, keyCol +: extraStats)
    val specs =
      if (specs0.exists(_.name == hashStatName(keyCol))) specs0
      else StatSpec(hashStatName(keyCol), keyHash(col(keyCol)),
        isSum = false) +: specs0
    // NOTE (r17 A/B): computing these stats by READING BACK the just-
    // written dirs (column-pruned to the stat columns) measured flat-
    // to-worse at sf0.1 (192-270 ms vs 173 ms for the recompute — the
    // read-back pays listing + a fresh scan job and this table is two
    // columns wide, so pruning saves nothing). The recompute re-scans
    // the SOURCE dirs, which are immutable, so both forms describe the
    // committed rows exactly. On a WIDE table at 100 TB the read-back
    // scans |stat cols| of the new files where the recompute re-pays
    // the full source scan — revisit with a wide-table fixture before
    // flipping.
    val stats = bucketStats(snap, bucket, specs,
      effectiveBloomCols(st0, snap))
    __tick("bucketStats")
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, cs, bl) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, cs, blooms = bl)
      }
    val removes = live0.map(_.dir)
    val bytes = renderManifest("rewrite", adds, removes, Some(keyCol),
      Some(ddlOf(snap)))
    val rv = claimRewrite(spark, root, "optimizeHash", v0, removes.toSet, bytes)
    __tick("claim")
    rv
  }

  /** COMPACT the small-dir tail (the published Delta OPTIMIZE
    * bin-packing shape at this log's dir granularity): streaming
    * intakes, per-key merges and CDC replicas leave a long tail of
    * tiny dirs — per-dir manifest and task overhead grows with the
    * COUNT, not the bytes — and at 100 TB the fix must cost O(small
    * tail), never O(table): [[optimizeRange]]/[[optimizeHash]] read
    * the whole snapshot, this reads ONLY the live dirs under
    * `targetRows`. Those rows re-cluster into ceil(rows/targetRows)
    * fixed-width buckets of the table's stats column — value ranges
    * when the key has a value span, portable-hash ranges otherwise
    * ([[keyHash]], the string-key layout) — so compaction TIGHTENS
    * spans instead of smearing them: the output prunes at least as
    * well as [[optimizeRange]]/[[optimizeHash]] output at the same
    * width, and dirs at or above target keep their existing (often
    * optimize-tight) stats untouched. Masked rows materialize for the
    * compacted dirs exactly like any rewrite (their tombstone state
    * bakes in; the mask stays live for untouched dirs). Fewer than 2
    * qualifying dirs is a NO-OP returning the current version — a
    * maintenance daemon can call this idly. Same optimistic
    * validation as [[rewrite]] ([[claimRewrite]] over just the
    * compacted inputs: appends and disjoint rewrites survive, input
    * theft or an intervening tombstone aborts), with Delta's bounded
    * auto-retry via `conflictRetries`. */
  def optimizeCompact(spark: SparkSession, root: String,
      targetRows: Long, extraStats: Seq[String] = Seq.empty,
      conflictRetries: Int = 0): Long = {
    require(targetRows >= 1,
      s"optimizeCompact: targetRows must be >= 1, got $targetRows")
    withConflictRetry(conflictRetries) {
      val st0 = foldLog(spark, root, None)
      val (v0, live0, dvs0) = (st0.version, st0.files, st0.dvs)
      val small = live0.filter(_.rows < targetRows)
      if (small.size < 2) v0 else {
      val snap = readMasked(spark, root, small,
        pinnedSchemaAt(spark, root, v0), dvs0, st0.clones, st0.evos)
      val keyColOpt = statsColumn(spark, root)
        .filter(snap.columns.contains)
      // bucket count from the PRE-mask row sum (masked rows only
      // shrink bins); bucket expression from the key's value span,
      // falling back to its hash span (string keys) — the same stat
      // the table's reads prune on
      val nOut = math.max(1L,
        (small.map(_.rows).sum + targetRows - 1) / targetRows)
      val bucket = keyColOpt match {
        case Some(kc) =>
          val r = snap.agg(min(col(kc).try_cast("long")),
            max(col(kc).try_cast("long"))).head()
          if (r.isNullAt(0)) {
            val width = math.max(1L, (HashSpace + nOut - 1) / nOut)
            (keyHash(col(kc)) / width).cast("long")
          } else {
            val (mn, mx) = (r.getLong(0), r.getLong(1))
            val width = math.max(1L, (mx - mn + nOut) / nOut)
            coalesce(((col(kc).try_cast("long") - mn) / width).cast("long"),
              lit(0L))
          }
        case None => lit(0L) // stat-less table: one packed dir
      }
      val rel = s"data/${java.util.UUID.randomUUID()}"
      snap.withColumn("__b", bucket)
        .repartition(col("__b"))
        .write.mode(SaveMode.ErrorIfExists)
        .partitionBy("__b").parquet(s"$root/$rel")
      val stats = keyColOpt match {
        case Some(kc) => bucketStats(snap, bucket,
          statSpecs(snap, kc +: extraStats), effectiveBloomCols(st0, snap))
        case None => bucketStats(snap, bucket, Seq.empty,
          effectiveBloomCols(st0, snap))
      }
      val fs = rawFs(spark, root)
      val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
          val (n, cs, bl) = stats(sub.stripPrefix("__b=").toLong)
          AddFile(s"$rel/$sub", n, cs, blooms = bl)
        }
      val removes = small.map(_.dir)
      val bytes = renderManifest("compact", adds, removes, keyColOpt,
        Some(ddlOf(snap)))
      claimRewrite(spark, root, "optimizeCompact", v0, removes.toSet, bytes)
      }
    }
  }

  /** The rewrite-family claim loop: claim the next version, and on
    * collision abort iff an intervening commit removed one of this
    * rewrite's inputs (appends and disjoint rewrites survive). */
  private def claimRewrite(spark: SparkSession, root: String, op: String,
      v0: Long, mine: Set[String], bytes: Array[Byte]): Long = {
    var attempt = 0
    var v = v0 + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"$op: could not claim a version after $MaxClaimRetries tries")
      val head = latestVersion(spark, root)
      val inter = commitsInRange(spark, root, v0, head)
      val conflicting = inter.filter(_.removes.exists(mine))
      if (conflicting.nonEmpty) throw new TxConflictException(
        s"$op of $root lost v${conflicting.map(_.version).min}: " +
          "an intervening commit removed one of its inputs — retry on " +
          "a fresh snapshot (orphan data dir reclaimed by vacuum)")
      // an intervening tombstone's mask would be LOST by this rewrite
      // (its output postdates the tombstone, making it inert) — abort
      val tomb = inter.filter(_.dvs.nonEmpty)
      if (tomb.nonEmpty) throw new TxConflictException(
        s"$op of $root lost v${tomb.map(_.version).min}: an intervening " +
          "tombstone masks rows this rewrite read — retry on a fresh " +
          "snapshot")
      // a rewrite replaces the table wholesale, so a constraint that
      // landed since the snapshot never validated this output either
      checkNoNewConstraints(spark, root, v0, op)
      v = math.max(head + 1, v + 1)
    }
    v
  }

  /** Write a CHECKPOINT of the live set at the current head, so later
    * readers fold from here instead of replaying the whole log.
    * Racing checkpointers at the same version are harmless — the
    * claim is create-if-absent and the content is identical. Returns
    * the checkpointed version. */
  def checkpoint(spark: SparkSession, root: String): Long = {
    val st = foldLog(spark, root, None)
    require(st.version > 0, s"checkpoint: $root has no commits")
    // travel-anchor backfill for PRE-ANCHOR logs (the _hint migration
    // rule: one maintenance checkpoint upgrades the log): the fold's
    // incremental prefix-max is unknown when the base checkpoint
    // predates anchors, so walk the commit history ONCE — here, at
    // maintenance time, never on a read path — and every later
    // checkpoint folds incrementally again. Stays None (and the log
    // stays walk-resolved) only when some commit predates in-commit
    // timestamps entirely.
    val tsAnchor = st.tsMax.orElse {
      var r: Option[Long] = Some(Long.MinValue)
      var v = 1L
      while (v <= st.version && r.isDefined) {
        val t = readManifest(spark, root, manifestName(v, "commit")).ts
        r = for (a <- r; b <- t) yield math.max(a, b)
        v += 1
      }
      r.filter(_ != Long.MinValue)
    }
    // live (non-inert) tombstones ride in the checkpoint with explicit
    // versions (inert ones drop out of the manifest chain here), and
    // the live constraint set folds forward the same way
    publishIfAbsent(spark, root, manifestName(st.version, "checkpoint"),
      renderManifest("checkpoint", st.files, Seq.empty, None,
        dvs = st.dvs, dvVersions = true, constraints = st.constraints,
        gc = st.gcHorizon, clones = st.clones, evos = st.evos,
        evoVersions = true,
        // travel anchors: the fold already carried the prefix-max
        // in-commit ts (omitted when some covered commit predates
        // timestamps) and the checkpoint it started from — zero
        // extra reads
        tsMax = tsAnchor,
        prevCkpt = Some(st.ckptUsed.getOrElse(0L)),
        bloomColsDecl = Some(st.bloomCols).filter(_.nonEmpty)))
    st.version
  }

  /** RESTORE the table to its state at `toVersion` — rollback as a
    * NEW commit (the published Delta `RESTORE TABLE ... VERSION AS OF`
    * shape): the log keeps its full history, nothing is rewound or
    * deleted, the head simply becomes the target state again (and the
    * mis-step stays auditable — [[history]] shows the bad commits AND
    * the restore). METADATA-ONLY in the common case: data dirs are
    * immutable and still on disk inside the retention window (the
    * [[retentionGuard]] refuses a restore past a vacuum horizon), so
    * the commit just re-adds the target's dirs — original stats and
    * schema generations preserved, so pruning and mixed-generation
    * reads keep working — and removes the current extras. Restoring a
    * 100 TB table after a botched job moves ZERO data bytes. Schema
    * and CHECK constraints restore with the data: the commit re-pins
    * the target DDL and re-asserts/drops constraints so the head
    * contract equals toVersion's exactly.
    *
    * Tombstones are the one place a restore may touch data: a
    * tombstone published AFTER the target would still mask restored
    * rows (its version postdates their dirs' add versions — the mask
    * rule), silently re-deleting rows that were visible at toVersion.
    * Restore therefore MATERIALIZES exactly the target dirs whose
    * recorded stats admit a post-target tombstone key (value span;
    * hash span for string keys; stat-less dirs conservatively count)
    * — read at the target state with the target's own masks applied,
    * rewritten fresh so their new generation postdates every
    * tombstone — and re-adds the provably untouched rest as metadata.
    * No post-target tombstones → no data movement at all; a narrow
    * takedown since the target → a narrow rewrite, never the table.
    *
    * Concurrency: the diff is exact against the head it resolved, so
    * ANY intervening commit invalidates it — a claim collision aborts
    * with [[TxConflictException]] (`conflictRetries` re-runs the
    * whole restore, Delta's bounded loop). Returns the committed
    * version. */
  def restore(spark: SparkSession, root: String, toVersion: Long,
      conflictRetries: Int = 0): Long =
    restoreWithHook(spark, root, toVersion, conflictRetries)(() => ())

  /** [[restore]] with the deterministic interleaving seam the race
    * specs drive (the mergeWithHook pattern): `beforeClaim` runs
    * between diff resolution (and any materialization write) and the
    * first claim attempt. */
  private[graft] def restoreWithHook(spark: SparkSession, root: String,
      toVersion: Long, conflictRetries: Int = 0)
      (beforeClaim: () => Unit): Long = withConflictRetry(conflictRetries) {
    require(toVersion >= 1,
      s"restore: target version must be >= 1, got $toVersion")
    retentionGuard(spark, root, toVersion, "restore")
    val st0 = foldLog(spark, root, None)
    require(toVersion <= st0.version,
      s"restore: $root is at v${st0.version} — cannot restore forward " +
        s"to v$toVersion")
    val stT = foldLog(spark, root, Some(toVersion))
    // REFUSED across a NET rename/drop: the restore re-pins the
    // target schema, but rename/drop lineage records in
    // (toVersion, head] stay live in the fold — a target-generation
    // dir would map its physical names forward PAST the target's
    // resolution (a renamed column reads NULL under the restored pin;
    // a pre-target tombstone's mask resolves against a name the
    // schema lacks and throws). The check is the NET effect, not mere
    // record presence: for every generation the restored live set
    // carries (data dirs and tombstone key versions), every physical
    // column must resolve to the SAME head name through the full
    // record chain as through the target's own — so a rename that was
    // renamed BACK (both metadata-only) restores fine, which is
    // exactly the documented workaround for the refused case; the
    // other is cloneTable at the target version. Additive
    // evolveSchema records no lineage and never trips this.
    val gensT = (stT.files.map(_.gen) ++ stT.dvs.map(_.version))
      .distinct.sorted
    val broken = gensT.flatMap { g =>
      val phys = pinnedSchemaAt(spark, root, g)
        .map(d => org.apache.spark.sql.types.StructType.fromDDL(d)
          .fieldNames.toSeq)
        .getOrElse(Seq.empty)
      phys.flatMap { p =>
        val atTarget = lineage(stT.evos, g, p)
        val atHead = lineage(st0.evos, g, p)
        if (atTarget == atHead) None
        else Some(s"gen v$g column '$p' resolves to " +
          s"${atHead.getOrElse("<dropped>")} at head but " +
          s"${atTarget.getOrElse("<dropped>")} at the target")
      }
    }
    if (broken.nonEmpty) throw new IllegalStateException(
      s"restore: cannot restore $root to v$toVersion across column " +
        s"rename/drop lineage (${broken.head}" +
        s"${if (broken.size > 1) s"; +${broken.size - 1} more" else ""}) " +
        "— restored generations would silently read NULL or lose " +
        "their tombstone masks under the restored pin. Apply the " +
        "inverse rename first (metadata-only), or cloneTable the " +
        "target version instead.")
    val pinT = pinnedSchemaAt(spark, root, toVersion)
    // post-target tombstones: left alone they would mask restored rows
    // (every target dir's generation predates them) — find the target
    // dirs whose stats admit one of their keys, exactly the merge
    // write path's span-then-hash pruning
    val dvsPost = commitsInRange(spark, root, toVersion, st0.version)
      .flatMap(_.dvs)
    val affected: Set[String] =
      dvsPost.groupBy(_.keyCol).toSeq.sortBy(_._1).flatMap {
        case (kc, ds) =>
          val keys = ds.map(d => spark.read
              .parquet(s"${baseFor(root, st0.clones, d.version)}/${d.rel}")
              .select(col(d.keyCol).as(kc)))
            .reduce(_.unionByName(_)).distinct()
          val r = keys.agg(min(col(kc).try_cast("long")).as("mn"),
            max(col(kc).try_cast("long")).as("mx")).head()
          val stringKeyed = r.isNullAt(0)
          val (lo, hi) =
            if (stringKeyed) (Long.MinValue, Long.MaxValue)
            else (r.getLong(0),
              if (r.getLong(1) == Long.MaxValue) Long.MaxValue
              else r.getLong(1) + 1)
          val bySpan = stT.files.filter(f => admits(f, kc, lo, hi))
          val hit =
            if (stringKeyed && bySpan.nonEmpty)
              hashAdmitted(spark, keys, kc, bySpan)
            else bySpan
          hit.map(_.dir)
      }.toSet
    val keepT = stT.files.filterNot(f => affected(f.dir))
    val liveNow = st0.files.map(_.dir).toSet
    val statsCol = statsColumnAt(spark, root, toVersion)
    val matAdd: Option[AddFile] =
      if (affected.isEmpty) None
      else {
        val matFiles = stT.files.filter(f => affected(f.dir))
        val df = readMasked(spark, root, matFiles, pinT, stT.dvs,
          st0.clones, stT.evos)
        Some(writeDataDir(spark, root, df, statsCol.toSeq,
          stT.constraints, effectiveBloomCols(st0, df)))
      }
    val adds = keepT.filterNot(f => liveNow(f.dir)) ++ matAdd.toSeq
    val keepDirs = keepT.map(_.dir).toSet
    val removes = st0.files.map(_.dir).filterNot(keepDirs)
    val dropCons = {
      val tNames = stT.constraints.map(_._1).toSet
      st0.constraints.map(_._1).filterNot(tNames)
    }
    val bytes = renderManifest("restore", adds, removes, statsCol,
      pinT, constraints = stT.constraints, dropConstraints = dropCons)
    beforeClaim()
    var attempt = 0
    var v = st0.version + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"),
        bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"restore: could not claim a version after $MaxClaimRetries tries")
      if (latestVersion(spark, root) > st0.version)
        throw new TxConflictException(
          s"restore of $root to v$toVersion lost: the diff was exact " +
            s"against head v${st0.version} and an intervening commit " +
            "landed — retry on a fresh snapshot (orphan dir reclaimed " +
            "by vacuum)")
      v += 1
    }
    v
  }

  /** ZERO-COPY SHALLOW CLONE — fork a table without moving a data
    * byte (the published Delta `CREATE TABLE ... SHALLOW CLONE`
    * shape, strengthened to a full FORK): the source's manifest log
    * (kilobytes per commit) is copied wholesale into the new root,
    * then one `clone` commit records the cut `(srcHead + 1, srcRoot)`.
    * Readers resolve each dir against the clone chain by its add
    * generation ([[baseFor]]): pre-fork dirs read from the source's
    * storage, post-fork dirs from the clone's own — so cloning a
    * 100 TB table is a metadata operation, and the clone is
    * immediately writable (appends/merges/tombstones land locally;
    * the source never sees them). Because the WHOLE log forks, the
    * clone keeps everything Delta's clone drops: time travel into
    * pre-fork history, CDC across the fork, schema generations,
    * constraints, retention horizons, producer idempotence tokens —
    * all verbatim. Clones nest (fork a fork): resolution walks to the
    * nearest cut above each dir's generation.
    *
    * Shared fate, CLOSED (Delta shallow clones live with it): the
    * clone registers a marker with the source (`_txlog/clones/`), and
    * the source's [[vacuum]] walks registered clones — transitively,
    * forks of forks — pinning every pre-fork dir a live clone still
    * reads ([[cloneReachableDirs]]). Deleting a clone's log, or
    * localizing it with any table-sized rewrite
    * ([[optimizeRange]]/[[optimizeHash]]/[[rewrite]]), releases its
    * pins on the next source vacuum. The marker write is the one
    * thing clone needs from the source side; a source on read-only
    * storage cannot be cloned safely (the create fails loud, not
    * silently unprotected). The clone's own vacuum is structurally
    * safe either way: it lists only the clone's local data dir, so
    * base-resident dirs are physically out of its reach.
    *
    * `dstRoot` must be empty. Returns the clone commit's version
    * (= source head + 1 at the cut). */
  def cloneTable(spark: SparkSession, srcRoot: String,
      dstRoot: String): Long = {
    val srcHead = latestVersion(spark, srcRoot)
    require(srcHead > 0, s"cloneTable: $srcRoot has no commits")
    require(latestVersion(spark, dstRoot) == 0,
      s"cloneTable: $dstRoot already has commits — clone into a fresh root")
    // qualify the base so the clone resolves it from any working
    // directory / defaultFS context
    val srcFs = rawFs(spark, srcRoot)
    val base = srcFs.makeQualified(
      new org.apache.hadoop.fs.Path(srcRoot)).toString
    require(!base.contains('|') && !base.contains('\n'),
      s"cloneTable: source path must not contain '|' or newlines: $base")
    // copy the manifest chain as listed at the cut — a source commit
    // landing mid-copy postdates the listing and is simply not forked
    listLog(spark, srcRoot).foreach { case (_, _, name) =>
      val in = srcFs.open(
        new org.apache.hadoop.fs.Path(logDir(srcRoot), name))
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      require(publishIfAbsent(spark, dstRoot, name, bytes),
        s"cloneTable: $dstRoot/$name already exists — concurrent clone " +
          "into the same root?")
    }
    val cut = srcHead + 1
    // register the clone WITH the source FIRST (a marker file, not a
    // commit — the source's version history is not the clone's
    // business): the source's [[vacuum]] walks these to keep every
    // pre-fork dir a live clone still references, closing the
    // shared-fate hole Delta shallow clones live with. Marker BEFORE
    // the clone commit, so no crash ordering can yield a FUNCTIONAL
    // clone the source doesn't know about — a crash right here
    // instead leaves a marker pointing at a commit-less fork, which
    // pins nothing (no clone record in its fold) and cleans up as a
    // stale marker once the debris dst is deleted. A marker whose
    // table was deleted pins nothing (skipped); a localized clone
    // (all live gens past its cut) pins nothing automatically.
    val dstFs = rawFs(spark, dstRoot)
    // sentinel FIRST: `_txlog/_cloned` marks "this log carries clone
    // records somewhere" so travel reads on never-cloned tables skip
    // the head fold [[cloneChain]] would otherwise pay just to learn
    // there is no chain (the overwhelmingly common case). Part of the
    // clone layout contract — cloneTable is the sanctioned fork path;
    // a crash after this create leaves a sentinel on a commit-less
    // debris dst, which costs one redundant head fold per travel read
    // and nothing else.
    val sentinel = new org.apache.hadoop.fs.Path(logDir(dstRoot), "_cloned")
    val sOut = dstFs.create(sentinel, true)
    try sOut.write("1".getBytes("UTF-8")) finally sOut.close()
    val qualifiedDst = dstFs.makeQualified(
      new org.apache.hadoop.fs.Path(dstRoot)).toString
    val marker = new org.apache.hadoop.fs.Path(
      s"${logDir(srcRoot)}/clones",
      s"c${java.util.UUID.randomUUID()}.ref")
    val out = srcFs.create(marker, false)
    try out.write(qualifiedDst.getBytes("UTF-8")) finally out.close()
    val bytes = renderManifest("clone", Seq.empty, Seq.empty, None,
      clones = Seq((cut, base)))
    require(publishIfAbsent(spark, dstRoot, manifestName(cut, "commit"),
      bytes), s"cloneTable: could not claim v$cut in $dstRoot")
    cut
  }

  /** The clone markers registered against `root` (files under
    * `_txlog/clones/`): (marker path, clone root), raw — stale
    * entries included. */
  private def cloneMarkerFiles(spark: SparkSession,
      root: String): Seq[(String, String)] = {
    val fs = rawFs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(s"${logDir(root)}/clones")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile).map { st =>
      val in = fs.open(st.getPath)
      val dst =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      (st.getPath.toString, dst)
    }.sortBy(_._2)
  }

  /** The clone roots registered against `root`, raw — stale entries
    * included. */
  private def cloneMarkers(spark: SparkSession,
      root: String): Seq[String] = cloneMarkerFiles(spark, root).map(_._2)

  /** Markers whose clone no longer exists (its log has no commits or
    * its filesystem is unreachable) — they pin nothing, they are just
    * debris; RunGc reports them and `--apply` removes them via
    * [[dropStaleCloneMarkers]]. Returns (marker path, dead clone
    * root). */
  def staleCloneMarkers(spark: SparkSession,
      root: String): Seq[(String, String)] =
    cloneMarkerFiles(spark, root).filterNot { case (_, dst) =>
      try latestVersion(spark, dst) > 0
      catch { case _: Exception => false }
    }

  /** Delete the stale clone markers under `root`; returns the dead
    * clone roots whose markers were removed. Safe by construction: a
    * marker is only removed when its clone's log is GONE — a live
    * clone's pins are never touched. */
  def dropStaleCloneMarkers(spark: SparkSession,
      root: String): Seq[String] = {
    val fs = rawFs(spark, root)
    staleCloneMarkers(spark, root).map { case (marker, dst) =>
      fs.delete(new org.apache.hadoop.fs.Path(marker), false)
      dst
    }
  }

  /** Every rel dir under `root` that a registered clone (transitively
    * — a fork of a fork still reads the original's storage) can still
    * reach: each live clone's HEAD fold is walked and its files and
    * tombstone key dirs whose clone-chain resolution lands on `root`
    * are pinned. Metadata-sized per clone (one fold); clones whose
    * log vanished (deleted experiments) pin nothing. */
  private def cloneReachableDirs(spark: SparkSession,
      root: String): Set[String] = {
    val qualifiedRoot = rawFs(spark, root).makeQualified(
      new org.apache.hadoop.fs.Path(root)).toString
    val seen = scala.collection.mutable.Set.empty[String]
    val pinned = Set.newBuilder[String]
    def walk(r: String): Unit = {
      if (!seen.add(r)) return
      cloneMarkers(spark, r).foreach { dst =>
        val live =
          try latestVersion(spark, dst) > 0
          catch { case _: Exception => false } // unreachable fs: skip
        if (live) {
          val st = foldLog(spark, dst, None)
          st.files.foreach { f =>
            if (baseFor(dst, st.clones, f.gen) == qualifiedRoot)
              pinned += f.dir
          }
          st.dvs.foreach { d =>
            if (baseFor(dst, st.clones, d.version) == qualifiedRoot)
              pinned += d.rel
          }
          walk(dst)
        }
      }
    }
    walk(root)
    pinned.result()
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  /** Snapshot-isolated read at `asOf` (head when None). The live set
    * is immutable once resolved, so the returned frame is stable no
    * matter what commits land while it executes. Mixed schema
    * generations (from [[evolveSchema]]) align to the pin AS OF the
    * resolved version — time travel to a pre-evolution version reads
    * the OLD schema, exactly what that version's readers saw. */
  def snapshot(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    asOf.foreach(v => retentionGuard(spark, root, v, "snapshot"))
    snapshotInner(spark, root, asOf)
  }

  /** [[snapshot]] without the retention guard — for internal reads
    * whose safety is proved by the caller (e.g. [[changes]] reads
    * version `horizon - 1`, whose dirs the vacuum provably retained:
    * anything removed after `horizon - 1` is referenced by an
    * in-window commit). */
  private def snapshotInner(spark: SparkSession, root: String,
      asOf: Option[Long]): DataFrame = {
    val st = foldLog(spark, root, asOf)
    require(st.files.nonEmpty, s"snapshot: $root is empty at v${st.version}")
    readMasked(spark, root, st.files,
      pinnedSchemaAt(spark, root, st.version), st.dvs,
      cloneChain(spark, root, st, asOf), st.evos)
  }

  /** The clone chain to resolve a fold's dirs with: a travel read
    * BELOW a clone cut folds a log prefix that predates the clone
    * commit itself, so its own record is missing — the HEAD fold's
    * chain (a superset; records never change after a log is created,
    * resolution keys on dir generation only) is always the correct
    * one. Head reads use their own fold for free, and travel reads on
    * a log [[cloneTable]] never touched skip the head fold via
    * sentinels: `_cloned` (written by cloneTable BEFORE the clone
    * commit) means "records exist — pay the head fold"; `_noclones`
    * means "a head fold once proved no records" — conclusive forever,
    * because clone records only enter a log at creation (cloneTable
    * refuses non-empty roots), so a log once seen record-free can
    * never gain one. NEITHER sentinel present is INCONCLUSIVE, not
    * negative: clone dsts created before the sentinel era carry
    * records with no `_cloned`, so the first such travel read pays
    * the head fold once and backfills whichever sentinel the fold
    * proves. `_cloned` is checked first — a reader racing cloneTable
    * in the copied-manifests/no-clone-commit-yet window can backfill
    * a stale `_noclones`, but cloneTable's `_cloned` (written before
    * the clone commit becomes visible) overrides it for every read
    * that could actually observe a record. */
  private def cloneChain(spark: SparkSession, root: String, st: LogState,
      asOf: Option[Long]): Seq[(Long, String)] = {
    if (asOf.isEmpty) return st.clones
    if (st.clones.nonEmpty) return foldLog(spark, root, None).clones
    val fs = rawFs(spark, root)
    val dir = logDir(root)
    if (fs.exists(new org.apache.hadoop.fs.Path(dir, "_cloned")))
      foldLog(spark, root, None).clones
    else if (fs.exists(new org.apache.hadoop.fs.Path(dir, "_noclones")))
      Seq.empty
    else {
      val head = foldLog(spark, root, None).clones
      val name = if (head.nonEmpty) "_cloned" else "_noclones"
      // backfill is BEST-EFFORT, like writeHint: this is a READ path,
      // and a read-only filesystem (or read-only credentials) must
      // keep serving travel reads — correctness never depends on the
      // sentinel, only the head-fold skip does, so a failed write
      // just means the next reader pays the head fold again
      try {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dir, name), true)
        try out.write("1".getBytes("UTF-8")) finally out.close()
      } catch { case scala.util.control.NonFatal(_) => () }
      head
    }
  }

  /** Fail a travel read below the strictest retention horizon any
    * [[vacuum]] recorded: the data dirs backing versions below the
    * horizon may be physically reclaimed, and a parquet FileNotFound
    * three stages into a job is the WRONG error — the window
    * violation should be named at plan time. The horizon folds
    * forward through checkpoints like the live set, so this is one
    * O(since-checkpoint) head fold, not a walk of every newer commit
    * (a gc commit at version g always records a horizon < g, so a
    * horizon that could block version `v` necessarily lives in a
    * commit above `v` — the head fold sees it). Versions AT or above
    * the horizon are always readable; head reads never pay this. */
  private def retentionGuard(spark: SparkSession, root: String,
      v: Long, what: String): Unit =
    foldLog(spark, root, None).gcHorizon.foreach { case (h, retain) =>
      if (v < h) throw new TxRetentionException(
        s"$what: version $v of $root is beyond the retention window — a " +
          s"vacuum (retainVersions=$retain) recorded horizon v$h, so data " +
          s"dirs below it may be reclaimed. Read a version >= $h, or " +
          "widen --retain-versions before vacuuming.")
    }

  /** Does a dir's recorded stat FOR `keyCol` admit `[lo, hi)`? A dir
    * with no stat on `keyCol` — stat-less, or stats recorded on OTHER
    * columns — can never be pruned (must scan). `hi = Long.MaxValue`
    * reads as UNBOUNDED ABOVE (there is no exclusive bound above the
    * max long, so a value of exactly Long.MaxValue must still
    * admit). */
  private def admits(f: AddFile, keyCol: String, lo: Long,
      hi: Long): Boolean =
    f.statFor(keyCol) match {
      case Some(st) =>
        (st.min < hi || hi == Long.MaxValue) && st.max >= lo
      case None => true
    }

  /** Range read with MANIFEST-LEVEL file skipping: only data dirs
    * whose recorded [min,max] FOR `keyCol` intersects `[lo, hi)` (plus
    * dirs with no stat on `keyCol`, which can never be pruned) reach
    * the Spark scan at all. The predicate is ALSO applied in-plan, so
    * pruning is purely an I/O optimization — results are exact
    * regardless of which columns any dir happened to record stats
    * on. */
  def snapshotRange(spark: SparkSession, root: String, keyCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame =
    snapshotRangeMulti(spark, root, Seq((keyCol, lo, hi)), asOf)

  /** Multi-predicate range read: a dir is pruned when ANY predicate's
    * recorded stat excludes it — the multi-column manifest-stats
    * consumer ([[appendCols]]/[[appendPartitioned]]/[[optimizeRange]]
    * `extraStats` record the stats; a z-order-style layout clusters
    * several dims, so the manifest should prune on each). All
    * predicates also apply in-plan (exactness regardless of stats). */
  def snapshotRangeMulti(spark: SparkSession, root: String,
      preds: Seq[(String, Long, Long)],
      asOf: Option[Long] = None): DataFrame =
    snapshotRangeMulti(spark, root, preds, asOf, Seq.empty)

  /** [[snapshotRangeMulti]] with IS NULL probes riding alongside:
    * `nullProbes` names columns the caller requires NULL — a dir
    * whose recorded null count for such a column is ZERO is pruned
    * exactly as a range-excluded dir is (the `graft-tx` relation
    * routes pushed `IsNull` filters here, so a SQL
    * `WHERE col IS NULL` skips null-free dirs at the manifest). All
    * predicates also apply in-plan — pruning stays I/O-only. */
  def snapshotRangeMulti(spark: SparkSession, root: String,
      preds: Seq[(String, Long, Long)],
      asOf: Option[Long], nullProbes: Seq[String]): DataFrame =
    snapshotRangeMulti(spark, root, preds, asOf, nullProbes, Seq.empty)

  /** [[snapshotRangeMulti]] with POINT probes riding alongside:
    * `pointProbes` are (column, value-as-string) equalities — a dir
    * whose recorded [[AddFile.blooms Bloom]] for the column provably
    * excludes the value is pruned at the manifest, which is what
    * turns `WHERE url = '…'` on a doc_id-clustered corpus (the
    * takedown-by-URL shape) from a table scan into a ≤K-dir read.
    * Dirs without a Bloom admit; every predicate re-applies in-plan —
    * pruning stays I/O-only, results exact regardless of stats. */
  def snapshotRangeMulti(spark: SparkSession, root: String,
      preds: Seq[(String, Long, Long)],
      asOf: Option[Long], nullProbes: Seq[String],
      pointProbes: Seq[(String, String)]): DataFrame = {
    require(preds.nonEmpty || nullProbes.nonEmpty || pointProbes.nonEmpty,
      "snapshotRangeMulti: no predicates")
    asOf.foreach(v => retentionGuard(spark, root, v, "snapshotRangeMulti"))
    val st = foldLog(spark, root, asOf)
    val (v, live, dvs) = (st.version, st.files, st.dvs)
    require(live.nonEmpty, s"snapshotRangeMulti: $root is empty at v$v")
    val kept = live.filter(f =>
      preds.forall { case (c, lo, hi) => admits(f, c, lo, hi) } &&
        nullProbes.forall(c =>
          f.statFor(nullStatName(c)).forall(_.max > 0L)) &&
        pointProbes.forall { case (c, s) => bloomAdmits(f, c, s) })
    val pin = pinnedSchemaAt(spark, root, v)
    // hi = Long.MaxValue means unbounded above — `< MaxValue` would
    // wrongly exclude a row whose value IS the max long
    val filter = (preds.map { case (c, lo, hi) =>
      val lower = col(c).try_cast("long") >= lo
      if (hi == Long.MaxValue) lower
      else lower && col(c).try_cast("long") < hi } ++
      nullProbes.map(c => col(c).isNull) ++
      pointProbes.map { case (c, s) => col(c).cast("string") === lit(s) })
      .reduce(_ && _)
    if (kept.isEmpty) {
      // preserve the schema without scanning data: the pin when one
      // exists, else one dir's footer-only schema
      val schema = pin
        .map(org.apache.spark.sql.types.StructType.fromDDL)
        .getOrElse(spark.read.parquet(
          s"${baseFor(root, cloneChain(spark, root, st, asOf),
            live.head.gen)}/${live.head.dir}")
          .schema)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else readMasked(spark, root, kept, pin, dvs,
        cloneChain(spark, root, st, asOf), st.evos)
      .where(filter)
  }

  /** SINGLE-VALUE POINT READ on any Bloom-statted column — the
    * takedown-by-URL / point-lookup-on-a-non-clustered-column door:
    * `snapshotPoint(root, "url", theUrl)` reads only the dirs whose
    * per-dir Bloom admits the value (≤ 1 + fp·dirs dirs, flat in
    * table size), with the equality re-applied in-plan. Columns
    * without Blooms (or legacy dirs) degrade to the full scan —
    * conservative, never wrong. The value is rendered CAST AS STRING,
    * matching the write-side hash. */
  def snapshotPoint(spark: SparkSession, root: String, c: String,
      value: Any, asOf: Option[Long] = None): DataFrame =
    snapshotRangeMulti(spark, root, Seq.empty, asOf, Seq.empty,
      Seq((c, String.valueOf(value))))

  /** KEYED POINT READ — fetch the live rows whose `keyCol` is in
    * `keys`, scanning only the dirs that can hold one: the read-side
    * twin of [[merge]]'s write-path pruning. Long-castable key sets
    * prune by the batch's value span; string keys (doc ids, URLs)
    * prune by interval-stabbing the per-dir portable-hash stats
    * ([[hashAdmitted]]), so on a hash-clustered table
    * ([[optimizeHash]]) fetching K documents by id reads ~K bounded
    * dirs NO MATTER the table size — at corpus scale, a point lookup
    * must never be a table scan. Tombstone masks and mixed schema
    * generations apply exactly as in [[snapshot]]; the semi-join
    * filter applies in-plan, so results are exact regardless of
    * stats. `keys` is MEANT to be a small key set (a takedown list, a
    * fetch batch — the [[tombstone]] size class); the semi-join
    * broadcasts it only while its distinct count is at or under
    * `maxBroadcastKeys` (default 1M — comfortably driver-sized) and
    * falls back to a shuffled semi-join above that, so an oversized
    * caller pays a shuffle instead of risking the driver. The prune
    * still applies either way (one span aggregate + at worst one
    * interval-stab job — both distributed). */
  def snapshotKeys(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, asOf: Option[Long] = None,
      maxBroadcastKeys: Long = 1000000L): DataFrame = {
    asOf.foreach(v => retentionGuard(spark, root, v, "snapshotKeys"))
    val st = foldLog(spark, root, asOf)
    val (v, live, dvs) = (st.version, st.files, st.dvs)
    require(live.nonEmpty, s"snapshotKeys: $root is empty at v$v")
    val ks = keys.select(col(keyCol)).distinct()
    val r = ks.agg(
      min(col(keyCol).try_cast("long")).as("mn"),
      max(col(keyCol).try_cast("long")).as("mx"),
      count(lit(1)).as("n")).head()
    val noKeys = r.getLong(2) == 0
    val stringKeyed = !noKeys && r.isNullAt(0)
    val (lo, hiEx) =
      if (stringKeyed) (Long.MinValue, Long.MaxValue)
      else if (noKeys) (0L, 0L) // empty span admits nothing
      else (r.getLong(0),
        if (r.getLong(1) == Long.MaxValue) Long.MaxValue
        else r.getLong(1) + 1)
    val bySpan =
      if (noKeys) Seq.empty
      else live.filter(f => admits(f, keyCol, lo, hiEx))
    val kept =
      if (stringKeyed && bySpan.nonEmpty) hashAdmitted(spark, ks, keyCol,
        bySpan)
      else bySpan
    val pin = pinnedSchemaAt(spark, root, v)
    if (kept.isEmpty) {
      val schema = pin
        .map(org.apache.spark.sql.types.StructType.fromDDL)
        .getOrElse(spark.read.parquet(
          s"${baseFor(root, cloneChain(spark, root, st, asOf),
            live.head.gen)}/${live.head.dir}")
          .schema)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else readMasked(spark, root, kept, pin, dvs,
        cloneChain(spark, root, st, asOf), st.evos)
      .join(if (r.getLong(2) <= maxBroadcastKeys) broadcast(ks) else ks,
        Seq(keyCol), "left_semi")
  }

  /** NULL-PROBE READ — the live rows whose `keyCol` IS NULL, scanning
    * only the dirs that can hold one: min/max spans cannot answer
    * `WHERE col IS NULL` (nulls don't order), so every write path
    * also records a per-dir NULL COUNT for its stats columns
    * ([[nullStatName]]) and this read skips every dir whose recorded
    * count is ZERO — the last common predicate class closed at the
    * manifest level (pre-r15 a null probe scanned the whole table).
    * Dirs without the stat (legacy, or stats recorded on other
    * columns) conservatively scan; the predicate also applies
    * in-plan, so results are exact regardless of stats. Tombstone
    * masks and schema generations apply exactly as in [[snapshot]]. */
  def snapshotNulls(spark: SparkSession, root: String, keyCol: String,
      asOf: Option[Long] = None): DataFrame = {
    asOf.foreach(v => retentionGuard(spark, root, v, "snapshotNulls"))
    val st = foldLog(spark, root, asOf)
    require(st.files.nonEmpty,
      s"snapshotNulls: $root is empty at v${st.version}")
    val nn = nullStatName(keyCol)
    val kept = st.files.filter(f => f.statFor(nn).forall(_.max > 0L))
    val pin = pinnedSchemaAt(spark, root, st.version)
    if (kept.isEmpty) {
      val schema = pin
        .map(org.apache.spark.sql.types.StructType.fromDDL)
        .getOrElse(spark.read.parquet(
          s"${baseFor(root, cloneChain(spark, root, st, asOf),
            st.files.head.gen)}/${st.files.head.dir}")
          .schema)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else readMasked(spark, root, kept, pin, st.dvs,
        cloneChain(spark, root, st, asOf), st.evos)
      .where(col(keyCol).isNull)
  }

  /** The skipping decision as DATA (the x122 shape): one row per live
    * dir at head with its stats FOR `keyCol` and whether a `[lo, hi)`
    * range read on that column scans it. Deterministic columns only
    * (no physical dir names). */
  def pruneAudit(spark: SparkSession, root: String, keyCol: String,
      lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    val (_, live) = liveFiles(spark, root)
    live.map { f =>
      (f.rows, f.statFor(keyCol).map(_.min),
        f.statFor(keyCol).map(_.max), admits(f, keyCol, lo, hi))
    }.toDF("n_rows", "min_key", "max_key", "scanned")
  }

  /** Manifest-stats HEALTH for `keyCol` at head, as ONE row — the
    * number [[graft.pipeline.RunGc]] watches to know when a table's
    * skipping has degraded past usefulness (interleaved appends each
    * span the whole key range, so [[snapshotRange]] and [[merge]]
    * prune nothing until the next [[optimizeRange]]/[[optimizeHash]]).
    * `overlap_ppm` = Σ per-dir stat span ×1e6 / global span: a
    * perfectly range-partitioned layout reads 1e6 (dirs tile the
    * domain once); k fully-interleaved appends read ≈ k×1e6 (every
    * point of the domain is covered k times — every range read scans
    * every dir). Emits ONE ROW PER STAT KIND present among the live
    * dirs — the VALUE stat for `keyCol` and/or its portable-hash
    * stat, the `stat` column naming each: a half-migrated table (old
    * value-statted dirs beside new hash-clustered ones) reports BOTH
    * sides, so neither family's degradation hides behind the other
    * (the pre-r15 form audited only the value side there, and each
    * row's n_stats against n_dirs shows the migration's progress). A
    * table carrying neither stat reads as one zero row under the
    * value name. Exact integer output (BigInt driver arithmetic, no
    * overflow at any key domain). */
  def statsAudit(spark: SparkSession, root: String,
      keyCol: String): DataFrame = {
    import spark.implicits._
    val (_, live) = liveFiles(spark, root)
    val nDirs = live.size.toLong
    def row(statName: String): Option[(String, Long, Long, Long, Long)] = {
      val st = live.flatMap(_.statFor(statName))
      if (st.isEmpty) None
      else {
        val gMin = st.map(_.min).min
        val gMax = st.map(_.max).max
        val spans = st.map(s => BigInt(s.max) - BigInt(s.min) + 1).sum
        val global = BigInt(gMax) - BigInt(gMin) + 1
        val ppm = (spans * 1000000 / global).toLong
        Some((statName, nDirs, st.size.toLong,
          spans.min(BigInt(Long.MaxValue)).toLong, ppm))
      }
    }
    // the NULL-COUNT stat gets its own health row when present:
    // sum_spans = total recorded nulls, overlap_ppm = the share of
    // STATTED dirs a null probe must scan (non-zero counts) ×1e6 —
    // 0 means IS NULL reads are free, 1e6 means they scan everything
    def nullRow: Option[(String, Long, Long, Long, Long)] = {
      val nn = nullStatName(keyCol)
      val st = live.flatMap(_.statFor(nn))
      if (st.isEmpty) None
      else Some((nn, nDirs, st.size.toLong, st.map(_.max).sum,
        st.count(_.max > 0L).toLong * 1000000L / st.size))
    }
    // the BLOOM stat kind's health row: sum_spans = total bits set
    // across dirs, overlap_ppm = mean fill ×1e6 (≈1e6 means the
    // filters saturated — point probes stop pruning, audit the dir
    // sizing; small fill means point reads stab ≤K dirs)
    def bloomRow: Option[(String, Long, Long, Long, Long)] = {
      val bs = live.flatMap(_.blooms.get(keyCol).map(ws =>
        ws.map(w => java.lang.Long.bitCount(w).toLong).sum))
      if (bs.isEmpty) None
      else Some((bloomStatName(keyCol), nDirs, bs.size.toLong, bs.sum,
        bs.sum * 1000000L / (bs.size.toLong * bloomWords * 64L)))
    }
    val rows = Seq(keyCol, hashStatName(keyCol)).flatMap(row) ++
      nullRow ++ bloomRow
    (if (rows.nonEmpty) rows else Seq((keyCol, nDirs, 0L, 0L, 0L)))
      .toDF("stat", "n_dirs", "n_stats", "sum_spans", "overlap_ppm")
  }

  /** CDC: the row-level delta of commits in `(fromV, toV]`, as the
    * table's columns plus `__version` and `__change`
    * (`insert`/`delete`). Inserts read each commit's added dirs;
    * deletes read its removed dirs (still on disk under the vacuum
    * retention contract). A rewrite therefore streams as
    * delete-all + re-insert — the honest physical delta; consumers
    * wanting logical diffs reconcile downstream. */
  def changes(spark: SparkSession, root: String,
      fromV: Long, toV: Long): DataFrame = {
    // the window reads data of commits >= fromV+1 (their add/remove
    // dirs) and snapshots at >= fromV (the dv deltas) — both retained
    // iff fromV+1 is at or above any recorded horizon (vacuum keeps
    // every dir referenced by commits above horizon-1)
    retentionGuard(spark, root, fromV + 1, "changes")
    val cs = commitsInRange(spark, root, fromV, toV)
    require(cs.nonEmpty, s"changes: no commits in ($fromV, $toV] at $root")
    // clone records never change after a log is created, so the head
    // fold's chain resolves every window's dirs (pre-fork -> base);
    // rename/drop lineage is scoped to the WINDOW END — a rename
    // after the window must not re-shape its deltas
    val headSt = foldLog(spark, root, None)
    val clones = headSt.clones
    val tEnd = math.min(toV, cs.map(_.version).max)
    val evos = headSt.evos.filter(_._1 <= tEnd)
    // align every part to the pin at the WINDOW END — a consumer of
    // (fromV, toV] reconciles in toV's schema; pre-evolution rows
    // backfill nulls exactly as a snapshot read would
    val target = pinnedSchemaAt(spark, root,
      math.min(toV, cs.map(_.version).max))
    // a removed dir's write-time generation lives in the live set just
    // BEFORE the removing commit (metadata-sized fold per removing
    // commit — only rewrites/merges pay it)
    val parts = cs.flatMap { c =>
      val ins = if (c.adds.isEmpty) None
        else Some(readAligned(spark, root, c.adds, target,
            clones = clones, evos = evos)
          .withColumn("__version", lit(c.version))
          .withColumn("__change", lit("insert")))
      val del = if (c.removes.isEmpty) None
        else {
          val (_, preLive) = liveFiles(spark, root, Some(c.version - 1))
          // a remove MUST name a dir live just before its commit — the
          // fold invariant every writer preserves. Guessing a stand-in
          // here (the pre-r15 fallback fabricated gen = c.version)
          // could resolve a clone's dir against the WRONG base root
          // and stream bogus deletes; a corrupted log is a loud stop,
          // never a silent misread.
          val removedFiles = c.removes.map(r =>
            preLive.find(_.dir == r).getOrElse(
              throw new IllegalStateException(
                s"changes: commit v${c.version} of $root removes '$r', " +
                  s"which is not live at v${c.version - 1} — the log is " +
                  "malformed (hand-edited manifest or non-atomic copy); " +
                  "refusing to fabricate a delta for it")))
          Some(readAligned(spark, root, removedFiles, target,
              clones = clones, evos = evos)
            .withColumn("__version", lit(c.version))
            .withColumn("__change", lit("delete")))
        }
      // a tombstone's delta: the rows it masked — the masked snapshot
      // just BEFORE it, semi-joined to its key set (every dir live
      // then predates it, so the version comparison is vacuous here)
      val dvDel = if (c.dvs.isEmpty) None
        else {
          val kc = c.dvs.head.keyCol
          val keys = c.dvs.map(d => spark.read
            .parquet(s"${baseFor(root, clones, d.version)}/${d.rel}")
            .select(col(d.keyCol).as(kc))).reduce(_.unionByName(_))
            .distinct()
          // the pre-takedown snapshot speaks the names in force at
          // c.version-1; renames up to the window end must apply
          // BEFORE the name-based alignment or a renamed column
          // would null out of the delta
          val pre = snapshotInner(spark, root, Some(c.version - 1))
            .join(keys, Seq(kc), "left_semi")
          val renamed = evos
            .filter(e => e._1 >= c.version && e._2 == "rename")
            .sortBy(_._1)
            .foldLeft(pre) { case (df, (_, _, from, to)) =>
              if (df.columns.contains(from)) df.withColumnRenamed(from, to)
              else df
            }
          Some(alignTo(renamed, target)
            .withColumn("__version", lit(c.version))
            .withColumn("__change", lit("delete")))
        }
      ins.toSeq ++ del.toSeq ++ dvDel.toSeq
    }
    if (parts.nonEmpty) parts.reduce(_.unionByName(_))
    else {
      // a METADATA-ONLY window (evolve/constrain/gc commits move no
      // rows) streams as an EMPTY delta in the window-end schema —
      // throwing here crashed every per-version CDC tail loop (the
      // x163 replica, the StreamingSpec materialized view) the first
      // time anyone ran evolveSchema on the source
      import org.apache.spark.sql.types._
      val base = target.map(StructType.fromDDL).getOrElse(
        throw new IllegalStateException(
          s"changes: only metadata commits in ($fromV, $toV] at $root " +
            "and no schema pin to shape the empty delta (legacy log)"))
      val schema = base.add("__version", LongType).add("__change", StringType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** ONE operational summary row (the DESCRIBE DETAIL surface): head
    * version, live-dir count, PHYSICAL row total (AddFile row counts
    * — pre-mask, the storage number; the logical count is a
    * `snapshot().count()` away), live tombstones, constraints, the
    * stats/clustering column, clone-chain depth, the newest
    * checkpoint (0 = none) and the enforced vacuum horizon (0 =
    * never vacuumed a referenced dir). Metadata-sized — folds the
    * log, never reads data; the first thing an operator asks a table
    * before deciding between compact / optimize / checkpoint. */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val st = foldLog(spark, root, None)
    Seq((st.version, st.files.size.toLong, st.files.map(_.rows).sum,
      st.dvs.size.toLong, st.constraints.size.toLong,
      statsColumn(spark, root).getOrElse("-"),
      st.clones.size.toLong,
      lastCheckpoint(spark, root).getOrElse(0L),
      st.gcHorizon.map(_._1).getOrElse(0L)))
      .toDF("version", "n_live_dirs", "phys_rows", "live_tombstones",
        "n_constraints", "stats_col", "clone_depth", "last_checkpoint",
        "gc_horizon")
  }

  /** The table's commit history as data (the DESCRIBE HISTORY
    * surface): one row per commit with its action, add/remove
    * footprint, committed row count, and producer token. Metadata-
    * sized — reads manifests, never data. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    commitsInRange(spark, root, 0L, Long.MaxValue).map { c =>
      (c.version, c.action, c.adds.size.toLong,
        c.adds.map(_.rows).sum, c.removes.size.toLong,
        c.txn.map(_._1).orNull,
        c.txn.map(t => java.lang.Long.valueOf(t._2)).orNull
          .asInstanceOf[java.lang.Long])
    }.toDF("version", "action", "n_adds", "rows_added", "n_removes",
      "txn_app", "txn_batch")
  }

  // ------------------------------------------------------------------
  // maintenance
  // ------------------------------------------------------------------

  /** Delete data dirs no retained reader can reach: a dir survives if
    * it is LIVE at any of the last `retainVersions` versions, or is
    * referenced (add or remove) by any commit in that window (CDC
    * still replays there), or is younger than `graceMs` (an in-flight
    * writer's dir has no manifest YET — age, not reachability, is the
    * only safe signal for those, exactly Delta's VACUUM rule).
    * Returns the deleted root-relative dirs. */
  def vacuum(spark: SparkSession, root: String, retainVersions: Int,
      graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val (horizon, doomed) = vacuumPlan(spark, root, retainVersions, graceMs)
    val fs = rawFs(spark, root)
    doomed.foreach(rel =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$rel"), true))
    // record WHAT the table no longer retains as a metadata commit —
    // the [[retentionGuard]] turns a travel read below the horizon
    // into a named window error instead of a parquet FileNotFound
    // mid-job. Only a vacuum that reclaimed a LOG-REFERENCED dir
    // commits: a dry pass reclaims nothing, and deleting a crashed
    // writer's orphan (a dir NO manifest ever named) invalidates no
    // travel read — recording those would advance head and silently
    // shrink the version-counted window for the data that matters.
    // Blind claim: gc moves no rows and conflicts with nothing.
    val referenced = listLog(spark, root).iterator
      .map(e => readManifest(spark, root, e._3))
      .flatMap(c => c.adds.map(_.dir) ++ c.dvs.map(_.rel))
      .toSet
    def wasReferenced(rel: String): Boolean =
      referenced.contains(rel) ||
        referenced.exists(_.startsWith(rel + "/"))
    if (doomed.exists(wasReferenced)) {
      val bytes = renderManifest("gc", Seq.empty, Seq.empty, None,
        gc = Some((horizon, retainVersions.toLong)))
      var attempt = 0
      var v = latestVersion(spark, root) + 1
      while (!publishIfAbsent(spark, root, manifestName(v, "commit"),
          bytes)) {
        attempt += 1
        if (attempt > MaxClaimRetries) throw new java.io.IOException(
          s"vacuum: no gc-record claim after $MaxClaimRetries tries")
        v = math.max(latestVersion(spark, root) + 1, v + 1)
      }
    }
    doomed
  }

  /** [[vacuum]]'s plan without the deletes — the dry-run surface
    * ([[graft.pipeline.RunGc]] reports these before an `--apply`).
    * Reclamation is TOP-LEVEL-dir granular: a nested bucket dir from
    * [[optimizeRange]] is reclaimed with its parent once no bucket of
    * that parent is reachable (a partially-superseded optimize keeps
    * its parent until the next optimize/rewrite supersedes it
    * whole — bytes over bookkeeping). */
  def vacuumCandidates(spark: SparkSession, root: String,
      retainVersions: Int,
      graceMs: Long = 24L * 3600 * 1000): Seq[String] =
    vacuumPlan(spark, root, retainVersions, graceMs)._2

  /** The shared plan: (horizon, doomed dirs) — one head read, so the
    * horizon [[vacuum]] records is exactly the one its candidate set
    * was computed against. */
  private def vacuumPlan(spark: SparkSession, root: String,
      retainVersions: Int, graceMs: Long): (Long, Seq[String]) = {
    val head = latestVersion(spark, root)
    if (head == 0) return (0L, Seq.empty)
    val horizon = math.max(1L, head - retainVersions + 1)
    val reachable = scala.collection.mutable.Set.empty[String]
    val horizonSt = foldLog(spark, root, Some(horizon))
    reachable ++= horizonSt.files.map(_.dir)
    val horizonDvs = horizonSt.dvs
    // tombstone key dirs back every retained snapshot's mask: a DV
    // live at head was live at the horizon too (inertness only grows —
    // files only ever gain HIGHER add versions), so horizon-live DVs
    // plus in-window commits cover every reachable key dir
    reachable ++= horizonDvs.map(_.rel)
    commitsInRange(spark, root, horizon - 1, head).foreach { c =>
      reachable ++= c.adds.map(_.dir)
      reachable ++= c.removes
      reachable ++= c.dvs.map(_.rel)
    }
    // registered clones pin the pre-fork dirs they still read — a
    // source vacuum must never break a live fork (the Delta shallow-
    // clone shared fate, closed); a localized or deleted clone pins
    // nothing
    reachable ++= cloneReachableDirs(spark, root)
    val fs = rawFs(spark, root)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    if (!fs.exists(dataDir)) return (horizon, Seq.empty)
    val now = System.currentTimeMillis()
    // an optimizeRange commit references NESTED dirs (data/<uuid>/__b=k);
    // the listed top-level dir is alive when any reachable path equals
    // it or lives under it
    def alive(rel: String): Boolean =
      reachable.contains(rel) || reachable.exists(_.startsWith(rel + "/"))
    (horizon, fs.listStatus(dataDir).toSeq.collect {
      case st if !alive(s"data/${st.getPath.getName}") &&
          now - st.getModificationTime >= graceMs =>
        s"data/${st.getPath.getName}"
    }.sorted)
  }
}
