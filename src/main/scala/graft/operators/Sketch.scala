package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH with a portable hash family — memory-bounded
  * heavy-hitter counting for streams/corpora whose exact key space
  * doesn't fit anywhere: the sketch is `depth × width` Longs (a few
  * KB) no matter how many distinct terms exist, errs only UPWARD
  * (est ≥ exact always; est ≤ exact + εN with ε = e/width at
  * confidence 1 − e^−depth — Cormode & Muthukrishnan 2005), and is
  * MERGEABLE by cell-wise addition, so it grows with intake batches
  * exactly like the DSIR/profile/BPE states (grown == one-shot,
  * bit-identically, because cells are exact Long sums).
  *
  * Spark ships `count_min_sketch`, but its binary form is opaque to
  * any other engine; this one hashes with the engine's md5-60
  * portable primitive, so an external SQL engine re-derives every
  * cell and every estimate bit-for-bit (the x108 DuckDB oracle does).
  *
  * Plan shape: build = one explode(depth) over the term relation →
  * one hash agg on (row, bucket) — map-side combine absorbs the
  * Zipf head before the shuffle, and the reduce side is ≤
  * depth × width rows. Estimate = the query terms (a model-sized
  * list) fan out to their depth cells → equi-join against the sketch
  * → min per term. Nothing scans the corpus twice, nothing sorts. */
object CountMin {

  /** Bucket of `term` for hash row `r` (0-based) under `salt`:
    * md5-60 of "salt:r:term" mod width — the engine's standard
    * portable draw, replayable anywhere md5 exists. */
  def bucket(term: Column, r: Int, width: Int, salt: String): Column =
    pmod(conv(substring(md5(
        concat_ws(":", lit(salt), lit(r), term)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build a sketch over the `termCol` relation (one row per term
    * OCCURRENCE — pre-weighted inputs can pass a `weight` column
    * instead). Output: (r, bucket, c) — at most depth × width rows,
    * the whole "index". */
  def build(df: DataFrame, termCol: Column, depth: Int = 4,
      width: Int = 1024, salt: String = "cms",
      weight: Column = lit(1L)): DataFrame =
    df.select(termCol.as("__t"), weight.as("__w"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          bucket(col("__t"), r, width, salt).as("bucket"))): _*))
        .as("__rb"), col("__w"))
      .groupBy(col("__rb.r").as("r"), col("__rb.bucket").as("bucket"))
      .agg(sum(col("__w")).as("c"))

  /** Merge sketches built with the SAME (depth, width, salt):
    * cell-wise Long addition — order-free, exact, so the grown sketch
    * is bit-identical to one built over the concatenated input. */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "CountMin.merge: need at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy("r", "bucket").agg(sum("c").as("c"))
  }

  /** Point estimates for the distinct terms of `terms(termCol)`:
    * each term fans out to its `depth` cells, equi-joins the sketch,
    * and takes the min cell — (term, cms_est). Terms whose every
    * cell is missing from the sketch (possible only if nothing ever
    * hashed there) read 0, the correct CMS answer for an unseen
    * term under this join shape. */
  def estimate(sketch: DataFrame, terms: DataFrame, termCol: Column,
      depth: Int = 4, width: Int = 1024, salt: String = "cms"): DataFrame =
    terms.select(termCol.as("term")).distinct()
      .select(col("term"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          bucket(col("term"), r, width, salt).as("bucket"))): _*))
        .as("__rb"))
      .select(col("term"), col("__rb.r").as("r"),
        col("__rb.bucket").as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left_outer")
      .groupBy("term")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
