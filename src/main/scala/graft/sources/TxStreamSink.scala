package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TxLog

/** The tx commit log as a NATIVE STRUCTURED STREAMING SINK —
  * `writeStream.format("graft-tx")` (r15 verdict item 4: the source
  * half became first-class in r15; this is the sink half, so a
  * replica is `readStream.format("graft-tx") ... writeStream
  * .format("graft-tx")` with no `foreachBatch` plumbing):
  *
  * {{{
  *   df.writeStream.format("graft-tx")
  *     .option("checkpointLocation", ...)
  *     .option("appId", "my-pipeline")        // idempotence stream id
  *     .start(dstRoot)                        // per-batch appendIdempotent
  *   // keyed upsert/CDC-apply instead of append:
  *   df.writeStream.format("graft-tx")
  *     .option("keyCol", "id")                // -> mergeIdempotent
  *     .option("deleteCol", "__del")          // optional CDC delete flag
  *     .start(dstRoot)
  * }}}
  *
  * EXACTLY-ONCE is the `(appId, batchId)` idempotence-token contract
  * ([[TxLog.appendIdempotent]]/[[TxLog.mergeIdempotent]], Delta's
  * SetTransaction pattern): Structured Streaming replays whole
  * micro-batches after a crash with the SAME batchId, and a replayed
  * batch re-resolves to its original commit and lands nothing — the
  * exact body the `foreachBatch` form at
  * [[graft.streaming.TxStream.replicate]] has always run, now behind
  * the format string. `appId` defaults to the streaming QUERY id
  * (checkpoint-stable), so two streams writing ONE table get distinct
  * token sequences by default — a fixed default would collide the
  * batchId sequences and silently drop the second stream's batches
  * (the same contract Delta's txn appId carries); pass `appId` only
  * to carry identity ACROSS checkpoints. Append output mode only:
  * Complete would need a per-batch table rewrite (an anti-pattern on
  * a commit log — aggregate downstream instead) and is refused. */
private[graft] class TxStreamSink(spark: SparkSession, root: String,
    parameters: Map[String, String]) extends Sink {

  // appId defaults to the STREAMING QUERY ID (stable across restarts
  // from the same checkpoint — it is persisted in the checkpoint
  // metadata), not a fixed string: two streams writing one table with
  // fixed-default appIds would collide on the (appId, batchId)
  // idempotence tokens and the later stream's batches would be
  // treated as replays and silently dropped (Delta keys txn on the
  // query id for the same reason). The option stays as an override
  // for deliberate cross-checkpoint identity. Resolved lazily: the
  // queryId local property is set on the microbatch thread, not at
  // sink construction.
  private val appIdOverride = parameters.get("appId")
  private lazy val appId = appIdOverride.orElse(
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .map("graft-tx-sink-" + _)).getOrElse(
    throw new IllegalStateException(
      "graft-tx sink: no streaming query id on this thread and no " +
        "'appId' option — pass .option(\"appId\", ...) so the " +
        "(appId, batchId) idempotence tokens have a stable identity"))
  private val keyCol = parameters.get("keyCol")
  private val deleteCol = parameters.get("deleteCol")
  private val statsCol = parameters.get("statsCol")
  // cdc=true: the incoming rows are a graft-tx SOURCE's change feed
  // (table columns + __version/__change) — reconcile each window to
  // one keyed merge ([[graft.streaming.TxStream.reconcile]]'s
  // latest-version-wins algebra), so the full replica is
  // readStream.format("graft-tx") ... writeStream.format("graft-tx")
  // with no foreachBatch plumbing
  private val cdc = parameters.get("cdc").exists(_.toBoolean)
  require(deleteCol.isEmpty || keyCol.isDefined,
    "graft-tx sink: 'deleteCol' (CDC delete flag) needs 'keyCol' — " +
      "deletes are keyed merges")
  require(!cdc || keyCol.isDefined,
    "graft-tx sink: 'cdc' reconciliation needs 'keyCol'")
  require(!cdc || deleteCol.isEmpty,
    "graft-tx sink: 'cdc' derives its own delete flag from __change — " +
      "drop the 'deleteCol' option")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is STREAMING-tagged (an IncrementalExecution);
    // re-tag its planned RDD as a batch frame (the ForeachBatchSink
    // move) before handing it to the batch write paths
    val qe = data.queryExecution
    val batch = Shims.batchDataFrame(data.sparkSession,
      qe.toRdd, qe.analyzed.schema)
    // empty micro-batches land NOTHING (no token needed: a replay of
    // an empty batch is empty again — skipping is idempotent by
    // itself, and committing empty dirs would grow the log with noise)
    if (batch.isEmpty) return
    keyCol match {
      case Some(k) if cdc =>
        TxLog.mergeIdempotent(spark, root,
          graft.streaming.TxStream.reconcile(batch, k), k, appId, batchId,
          deleteCol = Some("__del"),
          statsCols = statsCol.toSeq, conflictRetries = 2)
      case Some(k) =>
        TxLog.mergeIdempotent(spark, root, batch, k, appId, batchId,
          deleteCol = deleteCol,
          statsCols = statsCol.toSeq, conflictRetries = 2)
      case None =>
        TxLog.appendIdempotent(spark, root, batch, appId, batchId,
          statsCol.orElse(firstNumeric(batch)))
    }
    ()
  }

  private def firstNumeric(df: DataFrame): Option[String] =
    df.schema.fields.find(_.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]).map(_.name)

  override def toString: String = s"TxStreamSink[$root]"
}
