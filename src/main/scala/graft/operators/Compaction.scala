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
  * (delete old dir, rename tmp into place) via the Hadoop FileSystem.
  *
  * Contract:
  *  - row-level content is IDENTICAL before/after (spec-asserted);
  *    only file layout changes — probes, appends and searches are
  *    unaffected because nothing reads file boundaries;
  *  - the swap is NOT atomic (delete + rename): this is a MAINTENANCE
  *    operation — quiesce probes/appends for the table being swapped,
  *    exactly as for any in-place parquet overwrite. On object stores
  *    without cheap rename, prefer compact-to-new-path + repoint;
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
    val tmp = dir + ".compact.tmp"
    spark.read.parquet(dir)
      .repartition(col(partitionCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = dirPath.getFileSystem(conf)
    if (!fs.delete(dirPath, true))
      throw new java.io.IOException(s"compactTable: could not delete $dir")
    if (!fs.rename(tmpPath, dirPath))
      throw new java.io.IOException(
        s"compactTable: could not rename $tmp into place — table left at $tmp")
    (before, partFileCounts(spark, dir).values.sum)
  }

  /** Compact a [[Dedup.buildFuzzyIndex]] layout: both the `sets/` and
    * `bands/` tables (meta is one file — untouched). Returns the
    * (before, after) total file counts per table. */
  def compactFuzzyIndex(spark: SparkSession, path: String)
      : Map[String, (Int, Int)] = Map(
    "sets" -> compactTable(spark, s"$path/sets", "__idshard"),
    "bands" -> compactTable(spark, s"$path/bands", "__shard"))

  /** Compact a [[IvfAnn.buildIndexInt]] layout (one table, cell-
    * partitioned). */
  def compactIvfIndex(spark: SparkSession, path: String): (Int, Int) =
    compactTable(spark, path, "__cell")

  /** Compact a [[Dedup.buildExactIndex]] layout (digests table). */
  def compactExactIndex(spark: SparkSession, path: String): (Int, Int) =
    compactTable(spark, s"$path/digests", "__shard")
}
