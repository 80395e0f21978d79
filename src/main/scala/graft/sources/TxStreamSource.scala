package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.TxLog

/** The tx commit log as a FIRST-CLASS STREAMING SOURCE —
  * `spark.readStream.format("graft-tx").load(root)` with OFFSETS =
  * COMMIT VERSIONS (r14 verdict item 4, replacing the `_txlog` text-
  * file tail): each micro-batch is exactly
  * [[TxLog.changes]]`(fromV, toV]` — the table's columns plus
  * `__version`/`__change` — so tombstone masks, schema-generation
  * alignment, clone-chain resolution and the retention guard all
  * apply to the stream exactly as to batch CDC, and a checkpointed
  * restart resumes AT A VERSION, not at a file-listing watermark.
  *
  * Why the DSv1 streaming `Source` and not a DSv2 MicroBatchStream:
  * `getBatch` returns a whole DataFrame, so the engine's existing
  * CDC plan (manifest folds, masked multi-generation reads, rename
  * lineage) rides unchanged and lazily; a DSv2 PartitionReader would
  * force re-implementing readMasked at the InternalRow level. The
  * only internal touched is the isStreaming re-tag
  * ([[Shims.streamingDataFrame]] — the plan stays lazy, `toRdd`
  * materializes nothing).
  *
  * Options: `startingVersion` (default 1; the literal `latest`
  * starts past the head at stream definition — the tail-only
  * replica, Kafka's `latest` semantic) — the first version the
  * stream emits; a fresh stream on a vacuumed source names the
  * retention window loudly instead of replaying into it (pass a
  * version at or above the horizon, or bootstrap the replica
  * another way). `maxVersionsPerBatch` (default unbounded) caps how
  * many commit versions one micro-batch spans — the rate limit that
  * keeps a bootstrap over a 10k-commit history from arriving as ONE
  * table-sized batch (the engine drains the backlog across
  * successive batches; exactly-once holds per batch regardless).
  * Metadata-only windows stream as empty batches. The declared
  * schema is pinned at stream definition; a mid-stream rename/drop
  * fails the batch loudly rather than silently re-shaping the
  * stream. */
class TxStreamSource(spark: SparkSession, root: String,
    startingVersion: Long, maxVersionsPerBatch: Long = Long.MaxValue)
    extends Source {

  require(startingVersion >= 1,
    s"graft-tx stream: startingVersion must be >= 1, got $startingVersion")
  require(maxVersionsPerBatch >= 1,
    "graft-tx stream: maxVersionsPerBatch must be >= 1, got " +
      maxVersionsPerBatch)

  /** The stream's PROGRESS FLOOR — the version everything at or
    * below which is known emitted: the cap's anchor and the
    * new-data gate. Starts one below `startingVersion`; getBatch
    * advances it; `commit` ASSIGNS it outright, because the engine
    * replays commit(committedOffset) during checkpoint recovery and
    * that offset is the authoritative resume point — in particular
    * it OVERRIDES a `startingVersion=latest` recomputed at restart
    * (whose head may postdate the checkpoint: anchoring there would
    * stall the recovered tail until a brand-new commit landed).
    * Offsets, not this, are correctness; the floor only shapes
    * batch boundaries. */
  @volatile private var floor: Long = startingVersion - 1

  /** The fixed batch shape: the pin at stream definition plus the CDC
    * columns. */
  override val schema: StructType = TxStreamSource.schemaFor(spark, root)

  private def longOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalArgumentException(
      s"graft-tx stream: unexpected offset type ${other.getClass}")
  }

  override def getOffset: Option[V1Offset] = {
    val head = TxLog.latestVersion(spark, root)
    val capped = math.min(head,
      if (Long.MaxValue - maxVersionsPerBatch < floor) Long.MaxValue
      else floor + maxVersionsPerBatch)
    if (capped <= floor) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(longOf).getOrElse(startingVersion - 1)
    val toV = longOf(end)
    floor = math.max(floor, toV)
    val df =
      if (toV <= fromV)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else TxLog.changes(spark, root, fromV, toV)
        // align to the DECLARED schema: a missing column (mid-stream
        // rename/drop) is a loud AnalysisException, never a silent
        // re-shape
        .select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
    Shims.streamingDataFrame(spark, df.queryExecution.toRdd, schema)
  }

  // the engine replays commit(committedOffset) during checkpoint
  // recovery — the committed offset is the authoritative resume
  // point, so ASSIGN (see [[floor]]): a restarted stream keeps
  // draining forward from exactly there
  override def commit(end: V1Offset): Unit = {
    floor = longOf(end)
  }
  override def stop(): Unit = ()
}

private[graft] object TxStreamSource {
  /** The stream's schema: the table pin plus `__version`/`__change`. */
  def schemaFor(spark: SparkSession, root: String): StructType = {
    val pin = TxLog.pinnedSchema(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"graft-tx stream: $root has no commits (or no schema pin) — " +
          "the stream's shape is the pin; create the table first"))
    StructType.fromDDL(pin).add("__version", LongType)
      .add("__change", StringType)
  }
}
