package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * local filesystem (POSIX `link(2)` fails with EEXIST atomically),
  * `FileContext.rename(NONE)` on HDFS (namenode-atomic), and the
  * documented mapping on object stores is conditional put
  * (`If-None-Match: *`). Exactly one writer wins each version; losers
  * observe a complete, fully-written manifest (the link shares the
  * temp file's inode — no partial-content window) and retry against
  * the new head.
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

  /** One immutable data directory as recorded in a manifest. `dir` is
    * ROOT-RELATIVE (tables are relocatable); stats are on the
    * manifest's `statsCol` cast to long, absent for empty dirs or
    * stat-less commits (such dirs are never pruned). */
  final case class AddFile(dir: String, rows: Long,
      min: Option[Long], max: Option[Long])

  /** One manifest: `action` is `append`, `rewrite` or `checkpoint`.
    * `schema` is the committed frame's DDL — the table's schema PIN
    * (the RunIntake rule: a drifted batch is a loud error, never a
    * silently unreadable mixed-schema table). `txn` is the producer's
    * (appId, batchId) idempotence token (see [[appendIdempotent]]). */
  final case class TxCommit(version: Long, action: String,
      adds: Seq[AddFile], removes: Seq[String], statsCol: Option[String],
      schema: Option[String] = None, txn: Option[(String, Long)] = None)

  /** A rewrite lost optimistic validation: an intervening commit
    * removed one of its inputs. Retry the whole rewrite on a fresh
    * snapshot. */
  final class TxConflictException(msg: String)
    extends RuntimeException(msg)

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

  /** Publish `bytes` at `<logDir>/<name>` atomically, failing (false)
    * if the name is already claimed. Local FS: write temp + hard link
    * (atomic EEXIST, and the published name is born fully written —
    * it IS the temp file's inode). Other FS: temp + no-overwrite
    * FileContext rename (HDFS-atomic; object stores map this to
    * conditional put). */
  private def publishIfAbsent(spark: SparkSession, root: String,
      name: String, bytes: Array[Byte]): Boolean = {
    val fs = rawFs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(logDir(root))
    fs.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    if (fs.exists(dst)) return false // cheap pre-check; the claim below is the truth
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
      case _ =>
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, spark.sparkContext.hadoopConfiguration)
        try { fc.rename(tmp, dst); true } // Rename.NONE: fails if dst exists
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(dst) => false
        }
    }
    fs.delete(tmp, false)
    claimed
  }

  private def readManifest(spark: SparkSession, root: String,
      name: String): TxCommit = {
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
    var statsCol: Option[String] = None
    var schema: Option[String] = None
    var txn: Option[(String, Long)] = None
    val adds = Seq.newBuilder[AddFile]
    val removes = Seq.newBuilder[String]
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
        case "statscol" => statsCol = Some(value)
        case "schema" => schema = Some(value)
        case "txn" =>
          val bar = value.lastIndexOf('|')
          txn = Some((value.take(bar), value.drop(bar + 1).toLong))
        case "add" =>
          val f = value.split('|')
          def opt(s: String) = if (s == "-") None else Some(s.toLong)
          adds += AddFile(f(0), f(1).toLong, opt(f(2)), opt(f(3)))
        case "remove" => removes += value
        case _ => // forward-compatible: unknown keys ignored
      }
    }
    TxCommit(version, action, adds.result(), removes.result(), statsCol,
      schema, txn)
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
      txn: Option[(String, Long)] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("format=").append(FormatMajor).append('\n')
    sb.append("action=").append(action).append('\n')
    statsCol.foreach(c => sb.append("statscol=").append(c).append('\n'))
    schema.foreach(d => sb.append("schema=").append(d).append('\n'))
    txn.foreach { case (a, b) =>
      sb.append("txn=").append(a).append('|').append(b).append('\n') }
    adds.foreach { a =>
      def opt(o: Option[Long]) = o.map(_.toString).getOrElse("-")
      sb.append("add=").append(a.dir).append('|').append(a.rows)
        .append('|').append(opt(a.min)).append('|').append(opt(a.max))
        .append('\n')
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

  /** Head version of the table (0 when the log is empty). */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val vs = listLog(spark, root).collect { case (v, "commit", _) => v }
    if (vs.isEmpty) 0L else vs.max
  }

  /** The commits in `(fromV, toV]`, ascending — the CDC window. */
  def commitsInRange(spark: SparkSession, root: String,
      fromV: Long, toV: Long): Seq[TxCommit] =
    listLog(spark, root)
      .collect { case (v, "commit", n) if v > fromV && v <= toV => n }
      .map(readManifest(spark, root, _))

  /** Resolve the live file set at `asOf` (head when None): start from
    * the newest checkpoint at-or-before the target, fold the commits
    * after it. Returns (resolved version, live files). Reads
    * O(commits since checkpoint) manifests — this is why long-lived
    * tables checkpoint. */
  def liveFiles(spark: SparkSession, root: String,
      asOf: Option[Long] = None): (Long, Seq[AddFile]) = {
    val entries = listLog(spark, root)
    val commitVs = entries.collect { case (v, "commit", _) => v }
    if (commitVs.isEmpty) return (0L, Seq.empty)
    val target = asOf.getOrElse(commitVs.max)
    require(commitVs.exists(_ <= target) || target == 0,
      s"no commit at or before version $target in $root")
    val ckpt = entries
      .collect { case (v, "checkpoint", n) if v <= target => (v, n) }
      .sortBy(_._1).lastOption
    var live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    ckpt.foreach { case (_, n) =>
      readManifest(spark, root, n).adds.foreach(a => live.update(a.dir, a))
    }
    val from = ckpt.map(_._1).getOrElse(0L)
    entries.collect {
      case (v, "commit", n) if v > from && v <= target => n
    }.foreach { n =>
      val c = readManifest(spark, root, n)
      c.removes.foreach(live.remove)
      c.adds.foreach(a => live.update(a.dir, a))
    }
    (math.min(target, commitVs.max), live.values.toSeq)
  }

  /** The table's pinned schema: the newest commit that carries one
    * (every commit written by this code does; pre-pin manifests are
    * tolerated as None — no enforcement on legacy logs). Commits are
    * never deleted (only data dirs vacuum), so the scan always
    * terminates at the founding commit. */
  def pinnedSchema(spark: SparkSession, root: String): Option[String] =
    listLog(spark, root).collect { case (v, "commit", n) => (v, n) }
      .sortBy(-_._1).iterator
      .map(e => readManifest(spark, root, e._2).schema)
      .collectFirst { case Some(d) => d }

  /** Nullability-normalized single-line DDL — the pin's equality form
    * (a parquet read-back relaxes nullability; that must not read as
    * drift). */
  private def ddlOf(df: DataFrame): String =
    org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true))).toDDL

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /** Write `df` as a fresh immutable data dir and return its AddFile.
    * Stats are collected DURING the write itself (the Observation
    * API — metrics off the rows the write job commits), so an append
    * is exactly ONE pass over the data: the original form re-read the
    * written dir for count/min/max, and parquet aggregate pushdown is
    * off by default, so that read-back was a genuine second scan —
    * 2× write amplification at corpus scale (and a measured +204 ms
    * fixed job cost per append locally, TxAB). */
  private def writeDataDir(spark: SparkSession, root: String,
      df: DataFrame, statsCol: Option[String]): AddFile = {
    val rel = s"data/${java.util.UUID.randomUUID()}"
    val obs = org.apache.spark.sql.Observation(s"txstats-$rel")
    val metrics = statsCol match {
      case Some(c) => Seq(count(lit(1)).as("n"),
        min(col(c).cast("long")).as("mn"),
        max(col(c).cast("long")).as("mx"))
      case None => Seq(count(lit(1)).as("n"))
    }
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$rel")
    val m = obs.get
    AddFile(rel, m("n").asInstanceOf[Long],
      m.get("mn").flatMap(Option(_)).map(_.asInstanceOf[Long]),
      m.get("mx").flatMap(Option(_)).map(_.asInstanceOf[Long]))
  }

  private val MaxClaimRetries = 1000

  /** APPEND `df` as one commit. Blind adds commute with every other
    * commit, so claim collisions simply retry at the new head. The
    * batch must match the table's pinned schema (loud fail BEFORE any
    * write — a drifted producer never lands a byte); a [[rewrite]] is
    * the sanctioned way to change the schema. Returns the committed
    * version. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statsCol: Option[String] = None): Long = {
    val ddl = ddlOf(df)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"append: schema drift on $root — table pins [$p], batch is " +
        s"[$ddl]; an intentional change is a rewrite, not an append"))
    val add = writeDataDir(spark, root, df, statsCol)
    val bytes = renderManifest("append", Seq(add), Seq.empty, statsCol,
      Some(ddl))
    var attempt = 0
    var v = latestVersion(spark, root) + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"append: could not claim a version after $MaxClaimRetries tries")
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
  }

  /** The version that committed `(appId, batchId)`, if any — scans
    * commit manifests newest-first (commits are never deleted, only
    * data dirs vacuum, so the token record is durable). O(commits)
    * worst case when absent; producers that care cache their own
    * high-water mark. */
  def txnVersion(spark: SparkSession, root: String, appId: String,
      batchId: Long): Option[Long] =
    listLog(spark, root).collect { case (v, "commit", n) => (v, n) }
      .sortBy(-_._1).iterator
      .map(e => readManifest(spark, root, e._2))
      .collectFirst {
        case c if c.txn.contains((appId, batchId)) => c.version }

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
      statsCol: Option[String] = None): (Long, Boolean) = {
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
    val add = writeDataDir(spark, root, df, statsCol)
    val bytes = renderManifest("append", Seq(add), Seq.empty, statsCol,
      Some(ddl), Some((appId, batchId)))
    var attempt = 0
    while (true) {
      val head = latestVersion(spark, root)
      txnVersion(spark, root, appId, batchId) match {
        case Some(v) => return (v, false) // replay lost the race; dir -> vacuum
        case None =>
      }
      if (publishIfAbsent(spark, root, manifestName(head + 1, "commit"),
          bytes))
        return (head + 1, true)
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"appendIdempotent: no claim after $MaxClaimRetries tries")
    }
    throw new IllegalStateException("unreachable")
  }

  /** REWRITE the table: read the current snapshot, write
    * `transform(snapshot)` as fresh dirs, commit a manifest that
    * removes exactly the inputs read. Validation on claim collision:
    * intervening APPENDS survive (only the read inputs are removed);
    * an intervening commit that removed one of our inputs aborts with
    * [[TxConflictException]] (the orphan dir is left for [[vacuum]]).
    * Returns the committed version. */
  def rewrite(spark: SparkSession, root: String,
      statsCol: Option[String] = None)
      (transform: DataFrame => DataFrame): Long = {
    val (v0, live0) = liveFiles(spark, root)
    require(live0.nonEmpty, s"rewrite: $root has no live data at v$v0")
    val snap = spark.read.parquet(live0.map(f => s"$root/${f.dir}"): _*)
    val out = transform(snap)
    val add = writeDataDir(spark, root, out, statsCol)
    val removes = live0.map(_.dir)
    // a rewrite REPLACES the table, so its schema becomes the new pin
    // (the sanctioned schema-change path — Delta's overwriteSchema)
    val bytes = renderManifest("rewrite", Seq(add), removes, statsCol,
      Some(ddlOf(out)))
    claimRewrite(spark, root, "rewrite", v0, removes.toSet, bytes)
  }

  /** APPEND with RANGE partitioning: the batch lands as one commit of
    * `buckets` fixed-width key ranges, each its own AddFile with
    * tight min/max — so range reads prune within this batch from the
    * moment it lands, instead of waiting for the next
    * [[optimizeRange]] (a plain append's single dir spans whatever
    * keys the batch carried). Bucket widths derive from THIS batch's
    * key span. Costs one extra pass over the BATCH for the per-bucket
    * stats (plain [[append]] stays one-pass via in-write observation);
    * same blind-add concurrency as [[append]]. */
  def appendPartitioned(spark: SparkSession, root: String, df: DataFrame,
      keyCol: String, buckets: Int): Long = {
    require(buckets >= 1,
      s"appendPartitioned: buckets must be >= 1, got $buckets")
    val ddl = ddlOf(df)
    pinnedSchema(spark, root).foreach(p => require(p == ddl,
      s"appendPartitioned: schema drift on $root — table pins [$p], " +
        s"batch is [$ddl]"))
    val r = df.agg(min(col(keyCol).cast("long")),
      max(col(keyCol).cast("long"))).head()
    require(!r.isNullAt(0),
      s"appendPartitioned: $keyCol has no non-null values in the batch")
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (mx - mn + buckets) / buckets)
    val bucket = coalesce(
      ((col(keyCol).cast("long") - mn) / width).cast("long"), lit(0L))
    val rel = s"data/${java.util.UUID.randomUUID()}"
    df.withColumn("__b", bucket)
      .repartition(col("__b"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__b").parquet(s"$root/$rel")
    val stats = df.withColumn("__b", bucket)
      .groupBy("__b").agg(count(lit(1)).as("n"),
        min(col(keyCol).cast("long")).as("mn"),
        max(col(keyCol).cast("long")).as("mx"))
      .collect().map { s => s.getLong(0) ->
        (s.getLong(1),
          if (s.isNullAt(2)) None else Some(s.getLong(2)),
          if (s.isNullAt(3)) None else Some(s.getLong(3)))
      }.toMap
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, bmn, bmx) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, bmn, bmx)
      }
    val bytes = renderManifest("append", adds, Seq.empty, Some(keyCol),
      Some(ddl))
    var attempt = 0
    var v = latestVersion(spark, root) + 1
    while (!publishIfAbsent(spark, root, manifestName(v, "commit"), bytes)) {
      attempt += 1
      if (attempt > MaxClaimRetries) throw new java.io.IOException(
        s"appendPartitioned: no claim after $MaxClaimRetries tries")
      v = math.max(latestVersion(spark, root) + 1, v + 1)
    }
    v
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
      buckets: Int): Long = {
    require(buckets >= 1, s"optimizeRange: buckets must be >= 1, got $buckets")
    val (v0, live0) = liveFiles(spark, root)
    require(live0.nonEmpty, s"optimizeRange: $root has no live data at v$v0")
    val snap = spark.read.parquet(live0.map(f => s"$root/${f.dir}"): _*)
    val r = snap.agg(min(col(keyCol).cast("long")),
      max(col(keyCol).cast("long"))).head()
    require(!r.isNullAt(0),
      s"optimizeRange: $keyCol has no non-null values in $root")
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (mx - mn + buckets) / buckets) // ceil((mx-mn+1)/B)
    val bucket = coalesce(
      ((col(keyCol).cast("long") - mn) / width).cast("long"), lit(0L))
    val rel = s"data/${java.util.UUID.randomUUID()}"
    snap.withColumn("__b", bucket)
      .repartition(col("__b"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__b").parquet(s"$root/$rel")
    // one AddFile per nonempty bucket — stats from ONE grouped
    // aggregate over the snapshot (identical rows to what each bucket
    // dir just received), not B per-dir re-scans
    val stats = snap.withColumn("__b", bucket)
      .groupBy("__b").agg(count(lit(1)).as("n"),
        min(col(keyCol).cast("long")).as("mn"),
        max(col(keyCol).cast("long")).as("mx"))
      .collect().map { r => r.getLong(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    val fs = rawFs(spark, root)
    val adds = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$rel"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__b=")).sorted.toSeq.map { sub =>
        val (n, mn, mx) = stats(sub.stripPrefix("__b=").toLong)
        AddFile(s"$rel/$sub", n, mn, mx)
      }
    val removes = live0.map(_.dir)
    val bytes = renderManifest("rewrite", adds, removes, Some(keyCol),
      Some(ddlOf(snap)))
    claimRewrite(spark, root, "optimizeRange", v0, removes.toSet, bytes)
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
      val conflicting = commitsInRange(spark, root, v0, head)
        .filter(_.removes.exists(mine))
      if (conflicting.nonEmpty) throw new TxConflictException(
        s"$op of $root lost v${conflicting.map(_.version).min}: " +
          "an intervening commit removed one of its inputs — retry on " +
          "a fresh snapshot (orphan data dir reclaimed by vacuum)")
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
    val (v, live) = liveFiles(spark, root)
    require(v > 0, s"checkpoint: $root has no commits")
    publishIfAbsent(spark, root, manifestName(v, "checkpoint"),
      renderManifest("checkpoint", live, Seq.empty, None))
    v
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  /** Snapshot-isolated read at `asOf` (head when None). The live set
    * is immutable once resolved, so the returned frame is stable no
    * matter what commits land while it executes. */
  def snapshot(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val (v, live) = liveFiles(spark, root, asOf)
    require(live.nonEmpty, s"snapshot: $root is empty at v$v")
    spark.read.parquet(live.map(f => s"$root/${f.dir}"): _*)
  }

  /** Range read with MANIFEST-LEVEL file skipping: only data dirs
    * whose recorded [min,max] intersects `[lo, hi)` (plus stat-less
    * dirs, which can never be pruned) reach the Spark scan at all.
    * The predicate is ALSO applied in-plan, so pruning is purely an
    * I/O optimization — results are exact regardless of stats. */
  def snapshotRange(spark: SparkSession, root: String, keyCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame = {
    val (v, live) = liveFiles(spark, root, asOf)
    require(live.nonEmpty, s"snapshotRange: $root is empty at v$v")
    val kept = live.filter(f => (f.min, f.max) match {
      case (Some(mn), Some(mx)) => mn < hi && mx >= lo
      case _ => true // no stats — must scan
    })
    if (kept.isEmpty) {
      // preserve the schema without scanning data: read one dir's
      // footer-only schema and return the empty frame
      val schema = spark.read.parquet(s"$root/${live.head.dir}").schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(kept.map(f => s"$root/${f.dir}"): _*)
      .where(col(keyCol).cast("long") >= lo &&
        col(keyCol).cast("long") < hi)
  }

  /** The skipping decision as DATA (the x122 shape): one row per live
    * dir at head with its stats and whether a `[lo, hi)` range read
    * scans it. Deterministic columns only (no physical dir names). */
  def pruneAudit(spark: SparkSession, root: String,
      lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    val (_, live) = liveFiles(spark, root)
    live.map { f =>
      val scanned = (f.min, f.max) match {
        case (Some(mn), Some(mx)) => mn < hi && mx >= lo
        case _ => true
      }
      (f.rows, f.min, f.max, scanned)
    }.toDF("n_rows", "min_key", "max_key", "scanned")
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
    val cs = commitsInRange(spark, root, fromV, toV)
    require(cs.nonEmpty, s"changes: no commits in ($fromV, $toV] at $root")
    val parts = cs.flatMap { c =>
      val ins = if (c.adds.isEmpty) None
        else Some(spark.read
          .parquet(c.adds.map(a => s"$root/${a.dir}"): _*)
          .withColumn("__version", lit(c.version))
          .withColumn("__change", lit("insert")))
      val del = if (c.removes.isEmpty) None
        else Some(spark.read
          .parquet(c.removes.map(r => s"$root/$r"): _*)
          .withColumn("__version", lit(c.version))
          .withColumn("__change", lit("delete")))
      ins.toSeq ++ del.toSeq
    }
    parts.reduce(_.unionByName(_))
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
    val doomed = vacuumCandidates(spark, root, retainVersions, graceMs)
    val fs = rawFs(spark, root)
    doomed.foreach(rel =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$rel"), true))
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
      graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val head = latestVersion(spark, root)
    if (head == 0) return Seq.empty
    val horizon = math.max(1L, head - retainVersions + 1)
    val reachable = scala.collection.mutable.Set.empty[String]
    reachable ++= liveFiles(spark, root, Some(horizon))._2.map(_.dir)
    commitsInRange(spark, root, horizon - 1, head).foreach { c =>
      reachable ++= c.adds.map(_.dir)
      reachable ++= c.removes
    }
    val fs = rawFs(spark, root)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    if (!fs.exists(dataDir)) return Seq.empty
    val now = System.currentTimeMillis()
    // an optimizeRange commit references NESTED dirs (data/<uuid>/__b=k);
    // the listed top-level dir is alive when any reachable path equals
    // it or lives under it
    def alive(rel: String): Boolean =
      reachable.contains(rel) || reachable.exists(_.startsWith(rel + "/"))
    fs.listStatus(dataDir).toSeq.collect {
      case st if !alive(s"data/${st.getPath.getName}") &&
          now - st.getModificationTime >= graceMs =>
        s"data/${st.getPath.getName}"
    }.sorted
  }
}
