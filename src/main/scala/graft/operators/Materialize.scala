package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Lake materialization for shared subplans.
  *
  * When one aggregate feeds several plan branches, Catalyst can push
  * branch-specific predicates BELOW the shared aggregate (a filter on
  * a grouping column is cheaper before the agg), which un-shares it:
  * the physical plan re-scans the input once per branch (measured on
  * the q08 full-outer shape — three lineitem scans). AQE's
  * shuffle-stage reuse only dedupes branches whose exchanges stay
  * IDENTICAL, which the pushed filters defeat.
  *
  * [[toLake]] is the explicit fix: run the shared subplan ONCE, write
  * the (small, aggregated) result to the lake, and build every branch
  * from the read-back — the input is scanned exactly once, and each
  * branch scans only the aggregate. This is also the durable variant
  * of `localCheckpoint` (fault-tolerant, reusable across sessions —
  * the form the dedup operators recommend for expensive bases at
  * cluster scale).
  */
object Materialize {

  /** Write `df` to `path` (overwrite) and return the read-back frame.
    * The write is the single pass over the upstream plan; the returned
    * frame's lineage starts at the parquet, so no downstream branching
    * can re-trigger the upstream scan. */
  def toLake(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
