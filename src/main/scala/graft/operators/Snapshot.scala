package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus SNAPSHOT DIFF — the data-versioning primitive a managed
  * training corpus needs: given two snapshots of a document set (each
  * a frame of id + content digest), report exactly what changed
  * between them — `added` (id only in the new snapshot), `removed`
  * (id only in the old), `changed` (both, digests differ). Unchanged
  * documents are NOT emitted: at 100 TB the diff output must be
  * proportional to the CHURN, never to the corpus.
  *
  * The content digest is the same canonical-fingerprint idea the
  * exact-dedup tier is built on (see [[Dedup]]): compare 32-byte
  * digests, never text — the join shuffles id + digest pairs only.
  * With both snapshots stored sharded by id hash (the growing-index
  * layout), the join co-locates shard-by-shard; stock parquet
  * snapshots degrade to one ordinary shuffled join. No window, no
  * collect, no cartesian.
  *
  * Uses beyond audit: an incremental re-curation run feeds the
  * `added`+`changed` slice through [[Curate.intakeStep]] and the
  * `removed`+`changed` ids through the takedown deletes
  * ([[Dedup.deleteFromExactIndex]] / [[Dedup.deleteFromFuzzyIndex]])
  * — the diff IS the batch the incremental journey should process. */
object Snapshot {

  /** Diff two snapshots keyed by `idCol` with content digests in
    * `digestCol`. Returns one row per CHANGED document:
    * `(idCol, old_digest, new_digest, status)` with status in
    * {added, removed, changed}; `old_digest`/`new_digest` is null on
    * the side the document is absent from. Ids must be unique within
    * each snapshot (the corpus-unique-id contract every index tier
    * already assumes). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      digestCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol), col(digestCol).as("old_digest"))
    val n = newSnap.select(col(idCol), col(digestCol).as("new_digest"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest").isNull, lit("added"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed")))
      .where(col("status").isNotNull)
  }
}
