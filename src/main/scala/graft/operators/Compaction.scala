package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the persisted, partition-appended index
  * layouts ([[Dedup.buildFuzzyIndex]] + [[Dedup.appendToFuzzyIndex]],
  * [[IvfAnn.buildIndexInt]] + [[IvfAnn.appendToIndexInt]]): every
  * append adds at least one parquet file to each shard/cell partition
  * it touches, so a long-lived growing index accumulates files whose
  * per-file overhead (footer reads, task scheduling) eventually
  * dominates probe latency — the standard lake-maintenance problem
  * (Delta/Iceberg OPTIMIZE), solved here with plain parquet.
  *
  * Mechanics: read the table, `repartition(partitionCol)` so each
  * partition's rows land in exactly ONE task (one output file per
  * partition dir), write to a sibling `<dir>.compact.tmp`, then swap
  * via two renames (live → `<dir>.compact.old`, tmp → live) and only
  * then delete the `.old` copy — destroy-last, so a crash at ANY
  * point leaves a complete copy of the table under a deterministic
  * name (live, `.tmp`, or `.old`), never a window with no table.
  *
  * Contract:
  *  - row-level content is IDENTICAL before/after (spec-asserted);
  *    only file layout changes — probes, appends and searches are
  *    unaffected because nothing reads file boundaries;
  *  - the swap is NOT atomic (two renames): this is a MAINTENANCE
  *    operation — quiesce probes/appends for the table being swapped,
  *    exactly as for any in-place parquet overwrite. Recovery after a
  *    crash: if live exists, delete stray `.tmp`/`.old` siblings; if
  *    live is missing, rename whichever of `.old` (pre-swap content)
  *    or `.tmp` (compacted content — equivalent rows) survives into
  *    place. On object stores without cheap rename, prefer
  *    compact-to-new-path + repoint;
  *  - partition VALUES are preserved (dir names unchanged), so
  *    static-prune filters and partition-type inference behave
  *    exactly as before.
  */
object Compaction {

  /** Files-per-partition-dir count of `dir` (parquet data files only),
    * the observability half of compaction. */
  def partFileCounts(spark: SparkSession, dir: String): Map[String, Int] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Map.empty
    else fs.listStatus(path).filter(_.isDirectory).map { d =>
      d.getPath.getName ->
        fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
    }.toMap
  }

  /** Compact one partitioned parquet table in place: one file per
    * partition dir afterwards. Returns (files before, files after). */
  def compactTable(spark: SparkSession, dir: String,
      partitionCol: String): (Int, Int) = {
    val before = partFileCounts(spark, dir).values.sum
    replaceTable(spark, dir) { tmp =>
      spark.read.parquet(dir)
        .repartition(col(partitionCol))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(tmp)
    }
    (before, partFileCounts(spark, dir).values.sum)
  }

  /** Replace a parquet table's content with whatever `write` produces
    * at the sibling `.compact.tmp` path, via the destroy-LAST swap
    * (ADVICE r7): park the live table aside, promote the new copy,
    * and only then delete the parked original — a crash at ANY point
    * leaves a complete copy under a deterministic name (live, `.tmp`,
    * or `.old`), never a window with no table. The recovery rule and
    * quiesce contract are the object-level scaladoc above. Shared by
    * [[compactTable]] and the snapshot-sync accepted-table rewrite
    * ([[graft.pipeline.RunSync]]). */
  def replaceTable(spark: SparkSession, dir: String)
      (write: String => Unit): Unit = {
    val tmp = dir + ".compact.tmp"
    write(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(dir + ".compact.old")
    val fs = dirPath.getFileSystem(conf)
    if (fs.exists(oldPath) && !fs.delete(oldPath, true))
      throw new java.io.IOException(
        s"replaceTable: could not clear stale $oldPath")
    if (!fs.rename(dirPath, oldPath))
      throw new java.io.IOException(
        s"replaceTable: could not park $dir aside — table untouched, " +
          s"new copy left at $tmp")
    if (!fs.rename(tmpPath, dirPath)) {
      fs.rename(oldPath, dirPath) // roll back; original content intact
      throw new java.io.IOException(
        s"replaceTable: could not promote $tmp — original restored at $dir")
    }
    fs.delete(oldPath, true) // best-effort reclaim; content already live
  }

  /** The [[replaceTable]] crash-recovery rule as CODE (the scaladoc
    * prose above, executable): given a table dir that may carry
    * `.compact.tmp` / `.compact.old` siblings from an interrupted
    * swap, restore the invariant "exactly one complete copy, at the
    * live path". Returns what was done:
    *
    *  - `"clean"`        — live exists, no siblings; nothing to do
    *  - `"cleared"`      — live exists; stray siblings deleted (the
    *                       crash hit before the park, or after the
    *                       promote but before the reclaim — live is
    *                       authoritative either way)
    *  - `"restored-old"` — live missing; `.old` (pre-swap content)
    *                       renamed into place, stray `.tmp` deleted
    *                       (crash between park and promote)
    *  - `"restored-tmp"` — live and `.old` missing; `.tmp` (the new
    *                       copy — row-equivalent by the replaceTable
    *                       contract) renamed into place
    *
    * Throws if no copy exists at all (nothing to recover — the dir
    * never was a table, or something other than the swap destroyed
    * it). Idempotent: a second call returns `"clean"`. QUIESCE
    * REQUIRED, exactly as for the swap itself. */
  def recoverTable(spark: SparkSession, dir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".compact.old")
    val fs = live.getFileSystem(conf)
    def clear(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.delete(p, true)
    if (fs.exists(live)) {
      val cleared = clear(tmp) | clear(old)
      if (cleared) "cleared" else "clean"
    } else if (fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new java.io.IOException(
          s"recoverTable: could not restore $old to $dir")
      clear(tmp)
      "restored-old"
    } else if (fs.exists(tmp)) {
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(
          s"recoverTable: could not restore $tmp to $dir")
      "restored-tmp"
    } else throw new java.io.IOException(
      s"recoverTable: no copy of $dir exists (live/.old/.tmp all absent)")
  }

  // ------------------------------------------------------------------
  // READER-ATOMIC tables (VERDICT r9 item 5): the two-rename swap
  // above requires quiesced readers — between park and promote the
  // live path does not exist. For tables with UN-QUIESCED readers
  // (RunMix reading accepted/ while a sync rewrites it), the pointered
  // layout closes the window:
  //
  //   <root>/_current     — tiny manifest naming the live generation
  //   <root>/gen-<n>/     — complete table copies (current + previous)
  //
  // Readers resolve the pointer ([[resolveData]]) and read the named
  // generation. The swap writes the NEXT generation completely, then
  // flips `_current` with one atomic rename of a fully-written
  // manifest file — a reader at ANY interleaving resolves to either
  // the old or the new generation, both complete. GC keeps
  // `graceGens` generations behind the live one (default 2) as grace
  // copies for readers that resolved before recent flips — a reader
  // may straddle up to `graceGens` consecutive swaps between
  // resolving the pointer and finishing its scan; on a shared
  // cluster size the grace window to reader runtime by keeping more
  // generations. Plain tables (no `_current`) resolve
  // to themselves, so the reader path is backward-compatible.
  // ------------------------------------------------------------------

  private def fsFor(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The filesystem POINTER I/O must use: the checksum-wrapped local
    * FS renames a file and its `.crc` sidecar in TWO steps, so a
    * hammering reader can pair a freshly-renamed `_current` with the
    * previous generation's sidecar and fail the read with a checksum
    * error (caught by AtomicSwapSpec's hammer). The pointer's
    * integrity comes from the atomic rename of the fully-written
    * manifest, not from a sidecar — so the pointer bypasses the
    * checksum layer entirely (object stores and HDFS are unaffected:
    * they are not ChecksumFileSystems). */
  private def rawFsFor(spark: SparkSession, p: String)
      : org.apache.hadoop.fs.FileSystem =
    fsFor(spark, p) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** The data directory a reader should scan: `<root>/<gen>` when the
    * `_current` pointer exists, `root` itself otherwise (plain
    * layout — backward compatible). */
  def resolveData(spark: SparkSession, root: String): String = {
    val fs = rawFsFor(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(root, "_current")
    if (!fs.exists(ptr)) root
    else {
      val in = fs.open(ptr)
      val gen =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      s"$root/$gen"
    }
  }

  /** Read a table through its pointer (or directly when plain). */
  def readData(spark: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame =
    spark.read.parquet(resolveData(spark, root))

  /** Is `root` a [[TxLog]] transactional table? */
  def isTxTable(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_txlog")
    fsFor(spark, root).exists(p)
  }

  /** Read a table in ANY of the engine's layouts — transactional
    * (`_txlog/` commit log → head snapshot), pointered (`_current` →
    * live generation), or plain parquet. The single reader entry the
    * journeys use for the `accepted/` sink, so a state dir can adopt
    * the tx layout without touching its consumers. */
  def readAnyTable(spark: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame =
    if (isTxTable(spark, root)) TxLog.snapshot(spark, root)
    else readData(spark, root)

  private def genNumber(name: String): Option[Long] =
    if (name.startsWith("gen-"))
      scala.util.Try(name.stripPrefix("gen-").toLong).toOption
    else None

  private def currentGenNumber(spark: SparkSession, root: String): Option[Long] = {
    val cur = resolveData(spark, root)
    if (cur == root) None
    else genNumber(new org.apache.hadoop.fs.Path(cur).getName)
  }

  /** Atomically flip `_current` to `gen`. The manifest is written
    * fully to a unique temp name and RENAMED over the pointer — on
    * POSIX and HDFS (FileContext OVERWRITE) the rename is atomic, so
    * a concurrent reader sees the old or the new manifest, never a
    * partial one. */
  private def flipPointer(spark: SparkSession, root: String,
      gen: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"_current.tmp.${java.util.UUID.randomUUID()}")
    // raw fs: no .crc sidecar for the pointer (see rawFsFor), so the
    // OVERWRITE rename below moves exactly one file; a checksum-layer
    // rename also deletes any legacy destination sidecar (src has
    // none), so stale-crc pairings age out of pre-existing tables
    val fs = rawFsFor(spark, root)
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new org.apache.hadoop.fs.Path(root).toUri, conf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, "_current"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Ensure `root` is a pointered table and return its CURRENT data
    * dir (for appends). Fresh root → `gen-1` founded and pointed at.
    * An existing PLAIN table migrates: its data files move into
    * `gen-1` (rename, no copy), then the pointer appears — migration
    * mutates the layout and must run QUIESCED (the journeys call this
    * under their writer lease; it is a one-time event per table). */
  def ensureAtomic(spark: SparkSession, root: String): String = {
    val fs = fsFor(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    currentGenNumber(spark, root) match {
      case Some(n) => s"$root/gen-$n"
      case None =>
        val gen1 = new org.apache.hadoop.fs.Path(root, "gen-1")
        fs.mkdirs(gen1)
        if (fs.exists(rootPath)) {
          // migrate plain data files (if any) into gen-1
          fs.listStatus(rootPath).foreach { st =>
            val n = st.getPath.getName
            if (n != "gen-1" && !n.startsWith("_current") &&
                !n.startsWith("_lease"))
              fs.rename(st.getPath, new org.apache.hadoop.fs.Path(gen1, n))
          }
        }
        flipPointer(spark, root, "gen-1")
        s"$root/gen-1"
    }
  }

  /** READER-ATOMIC replacement: write the next generation completely,
    * flip the pointer, GC generations older than the previous. The
    * table stays resolvable to a COMPLETE copy at every instant;
    * single-WRITER discipline still applies (journey lease), readers
    * need nothing. A crash before the flip leaves an orphan gen dir
    * (invisible to readers; overwritten by the next swap or cleared
    * by gc); a crash after the flip is a completed swap. */
  def replaceTableAtomic(spark: SparkSession, root: String,
      graceGens: Int = 2)
      (write: String => Unit): Unit = {
    require(graceGens >= 1, s"replaceTableAtomic: graceGens $graceGens")
    val fs = fsFor(spark, root)
    val cur = currentGenNumber(spark, root).getOrElse {
      ensureAtomic(spark, root)
      currentGenNumber(spark, root).get
    }
    val next = cur + 1
    val nextDir = new org.apache.hadoop.fs.Path(root, s"gen-$next")
    if (fs.exists(nextDir)) fs.delete(nextDir, true) // crashed writer's orphan
    write(s"$root/gen-$next")
    flipPointer(spark, root, s"gen-$next")
    // GC: keep `graceGens` generations behind the new live one. The
    // grace window bounds how many CONSECUTIVE swaps a slow reader
    // may straddle between resolving the pointer and finishing its
    // scan: one grace gen covers a reader that resolved just before
    // THIS flip, but a reader descheduled across two back-to-back
    // swaps (maintenance loops; the hammer spec under a loaded host)
    // would find its generation deleted mid-read. Default 2 — size up
    // for long-running readers on shared clusters.
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      genNumber(st.getPath.getName).foreach { g =>
        if (g <= next - 1 - graceGens) fs.delete(st.getPath, true)
      }
    }
  }

  /** [[compactTable]] for a POINTERED table: the compacted copy
    * becomes the next generation and the pointer flips — small-file
    * maintenance that needs NO reader quiesce (the point of the
    * layout; writers still hold the journey lease). The intake
    * `accepted/` sink accumulates one-plus files per batch append, so
    * a long-lived deployment runs this beside RunGc. */
  def compactTableAtomic(spark: SparkSession, root: String,
      partitionCol: Option[String] = None): (Int, Int) = {
    val live = resolveData(spark, root)
    require(live != root,
      s"compactTableAtomic: $root is not a pointered table (no _current) " +
        "— ensureAtomic it first or use compactTable under quiesce")
    def files(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = fsFor(spark, dir)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet")) +
        fs.listStatus(p).filter(_.isDirectory)
          .map(d => fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))).sum
    }
    val before = files(live)
    replaceTableAtomic(spark, root) { next =>
      val df = spark.read.parquet(live)
      val writer = partitionCol match {
        case Some(c) => df.repartition(col(c)).write
          .mode(org.apache.spark.sql.SaveMode.Overwrite).partitionBy(c)
        case None => df.coalesce(1).write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
      }
      writer.parquet(next)
    }
    (before, files(resolveData(spark, root)))
  }

  /** Compact a [[Dedup.buildFuzzyIndex]] layout: both the `sets/` and
    * `bands/` tables (meta is one file — untouched). Returns the
    * (before, after) total file counts per table. */
  def compactFuzzyIndex(spark: SparkSession, path: String)
      : Map[String, (Int, Int)] = Map(
    "sets" -> compactTable(spark, s"$path/sets", "__idshard"),
    "bands" -> compactTable(spark, s"$path/bands", "__shard"))

  /** Compact a [[IvfAnn.buildIndexInt]] layout (one table, cell-
    * partitioned). The persisted centroid model (`_centroids/`, an
    * underscore-hidden subdirectory the data read never sees) would be
    * destroyed with the parked `.compact.old` copy by a plain
    * [[compactTable]] swap — so it is re-written INTO the compacted
    * copy before the swap, keeping the layout self-describing through
    * the whole destroy-last window. Layouts predating the persisted
    * model (no `_centroids/`) compact as before. */
  def compactIvfIndex(spark: SparkSession, path: String): (Int, Int) = {
    val centPath = new org.apache.hadoop.fs.Path(s"$path/_centroids")
    val fs = centPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val model =
      if (fs.exists(centPath)) Some(IvfAnn.loadCentroidsInt(spark, path))
      else None
    val before = partFileCounts(spark, path).values.sum
    replaceTable(spark, path) { tmp =>
      spark.read.parquet(path)
        .repartition(col("__cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("__cell").parquet(tmp)
      model.foreach(IvfAnn.writeCentroids(spark, _, tmp))
    }
    (before, partFileCounts(spark, path).values.sum)
  }

  /** Compact a [[Dedup.buildExactIndex]] layout (digests table). */
  def compactExactIndex(spark: SparkSession, path: String): (Int, Int) =
    compactTable(spark, s"$path/digests", "__shard")

  /** Compact a [[Dedup.buildSpanIndex]] layout (grams table; `meta/`
    * lives beside the table and is untouched by the swap). */
  def compactSpanIndex(spark: SparkSession, path: String): (Int, Int) =
    compactTable(spark, s"$path/grams", "__shard")
}
