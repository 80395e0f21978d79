package graft.streaming

import graft.operators.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The tx commit log AS a stream — the materialized-view pattern the
  * StreamingSpec drives, promoted to a library surface so a replica
  * is one line instead of forty. The log dir is the stream source
  * (Structured Streaming's file source tails the `v….commit` names
  * under `_txlog`; a commit manifest is immutable-once-named, so the
  * file-arrival event IS the commit event), and each version's CDC
  * delta ([[TxLog.changes]]) reconciles per key — latest version
  * wins; within a version insert beats delete, which is exactly a
  * rewrite's delete-all + re-insert collapsing to an upsert — then
  * lands downstream as ONE keyed MERGE.
  *
  * Exactly-once: every applied version goes through
  * [[TxLog.mergeIdempotent]] keyed by `(appId, sourceVersion)`, so a
  * replayed foreachBatch micro-batch (crash recovery, at-least-once
  * delivery) re-resolves to its original commit and lands nothing —
  * the kill-and-replay contract StreamingSpec pins. Versions apply in
  * order within a batch; a restart resumes from whatever the replica
  * has already admitted (the token check is the cursor — no side
  * state to lose).
  *
  * Scale: per micro-batch the work is O(delta), not O(table) — the
  * MERGE write path prunes to the dirs that can hold the delta's
  * keys (value spans; portable-hash spans for string keys), and
  * metadata-only source commits (evolve/constrain/gc) stream as
  * empty deltas and are skipped. Restore and compact commits stream
  * as their honest physical deltas and reconcile like any rewrite
  * (TxLakeSpec pins replica convergence across both). */
object TxStream {

  /** The reconciled, MERGE-ready delta of ONE source version:
    * `(keyCol, <table columns...>, __del)` — the key's latest row in
    * the window, `__del` true when its final state is deleted. */
  def reconciledDelta(spark: SparkSession, root: String, version: Long,
      keyCol: String): DataFrame = {
    val delta = TxLog.changes(spark, root, version - 1, version)
    val valueCols = delta.columns
      .filterNot(c => c == keyCol || c.startsWith("__")).toSeq
    delta.groupBy(keyCol)
      .agg(max(struct((col("__version") +:
        (col("__change") === "insert").cast("int").as("__ins") +:
        valueCols.map(col)): _*)).as("__m"))
      .select(col(keyCol) +:
        valueCols.map(c => col(s"__m.$c").as(c)) :+
        (col("__m.__ins") === 0).as("__del"): _*)
  }

  /** Follow `srcRoot`'s commit log and maintain `dstRoot` as an
    * exactly-once keyed replica. Returns the running
    * [[StreamingQuery]]; stop it to pause — a later `replicate` call
    * resumes from the tokens already admitted. `appId` names the
    * replica's idempotence stream (two replicas of one source use two
    * ids). */
  def replicate(spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCol: String, appId: String = "tx-replica",
      conflictRetries: Int = 2): StreamingQuery = {
    import spark.implicits._
    val applied = new java.util.concurrent.ConcurrentSkipListSet[Long]()
    spark.readStream.format("text")
      .load(s"$srcRoot/_txlog/*.commit")
      .select(input_file_name().as("f"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val versions = batch.select("f").distinct().as[String].collect()
          .flatMap(f => "v(\\d{20})\\.commit".r.findFirstMatchIn(f)
            .map(_.group(1).toLong))
          .filterNot(applied.contains).sorted
        versions.foreach { v =>
          val b = reconciledDelta(spark, srcRoot, v, keyCol)
          if (!b.isEmpty)
            TxLog.mergeIdempotent(spark, dstRoot, b, keyCol, appId, v,
              deleteCol = Some("__del"),
              conflictRetries = conflictRetries)
          applied.add(v) // session-local fast path; tokens are the truth
        }
        ()
      }
      .start()
  }

  /** One-shot catch-up: apply every source version in `(fromV, head]`
    * to the replica synchronously (the batch form of [[replicate]] —
    * bootstrap, backfill after downtime, tests). Returns the last
    * version applied. Idempotent: re-running skips admitted
    * versions via the same tokens. */
  def catchUp(spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCol: String, appId: String = "tx-replica",
      fromV: Long = 0L, conflictRetries: Int = 2): Long = {
    val head = TxLog.latestVersion(spark, srcRoot)
    ((fromV + 1) to head).foreach { v =>
      val b = reconciledDelta(spark, srcRoot, v, keyCol)
      if (!b.isEmpty)
        TxLog.mergeIdempotent(spark, dstRoot, b, keyCol, appId, v,
          deleteCol = Some("__del"), conflictRetries = conflictRetries)
    }
    head
  }
}
