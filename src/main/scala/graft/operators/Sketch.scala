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

/** BLOOM FILTER with the same portable hash family — the
  * NEGATIVE CACHE of the dedup stack: a membership screen with NO
  * false negatives ("definitely new" is trustworthy) and a bounded,
  * MEASURED false-positive rate ("maybe seen" goes on to the exact
  * probe). The intended composition at 100 TB: an intake batch probes
  * the bloom of the digest index first, and only the maybe-seen
  * minority pays the index partition reads — a mostly-novel batch
  * (the common case for a healthy crawl) skips almost all probe I/O.
  *
  * Representation: the relation of SET BIT POSITIONS (distinct
  * BIGINT, ≤ min(n·k, bits) rows) — not an opaque bitmap — so it is
  * mergeable by plain union+distinct (grown == one-shot exactly),
  * partition-prunable when persisted, and every bit replays in
  * external SQL through the md5-60 primitive (the x112/x113 oracles
  * re-derive the whole filter).
  *
  * Plan shape: build = explode(k) over the term relation → distinct
  * (map-side partial absorbs the dups); probe = terms fan out to
  * their k positions → equi-join the filter → per-term hit count,
  * present iff all k hit. Sizing rule: fill ratio
  * f = 1 − (1 − 1/bits)^(n·k), FP ≈ f^k; x113 MEASURES the realized
  * rate — every lossy tier ships its audit. */
object Bloom {

  /** Bit position of `term` for hash i under `salt`: md5-60 of
    * "salt:i:term" mod bits. */
  def bit(term: Column, i: Int, bits: Long, salt: String): Column =
    pmod(conv(substring(md5(
        concat_ws(":", lit(salt), lit(i), term)), 1, 15), 16, 10)
      .cast("long"), lit(bits))

  private def fanOut(terms: DataFrame, termCol: Column, k: Int,
      bits: Long, salt: String): DataFrame =
    terms.select(termCol.as("__t"))
      .select(col("__t"), explode(array((0 until k).map(i =>
        bit(col("__t"), i, bits, salt)): _*)).as("bit"))

  /** Build the set-bits relation over the `termCol` relation. */
  def build(df: DataFrame, termCol: Column, k: Int = 7,
      bits: Long = 1L << 20, salt: String = "bloom"): DataFrame =
    fanOut(df, termCol, k, bits, salt).select("bit").distinct()

  /** Merge filters built with the SAME (k, bits, salt): union +
    * distinct — order-free, so the grown filter is bit-identical to
    * one built over the concatenated input. */
  def merge(filters: Seq[DataFrame]): DataFrame = {
    require(filters.nonEmpty, "Bloom.merge: need at least one filter")
    filters.reduce(_.unionByName(_)).distinct()
  }

  /** Membership screen: (term, maybe_present). `maybe_present =
    * false` is DEFINITE absence (no false negatives — every bit of a
    * built term is in the relation by construction); `true` means
    * "pay the exact probe". */
  def probe(filter: DataFrame, terms: DataFrame, termCol: Column,
      k: Int = 7, bits: Long = 1L << 20, salt: String = "bloom"): DataFrame =
    fanOut(terms.select(termCol.as("__term")).distinct(),
        col("__term"), k, bits, salt)
      // distinct the filter side: a raw appended sidecar may carry
      // duplicate bit rows, and a dup would inflate the per-term hit
      // count past k — turning "all k bits present" false and breaking
      // the no-false-negative guarantee for any non-deduped input
      .join(filter.select(col("bit")).distinct()
          .select(col("bit"), lit(1).as("__hit")),
        Seq("bit"), "left_outer")
      .groupBy(col("__t").as("term"))
      .agg((count(col("__hit")) === k).as("maybe_present"))

  /** MEASURED false-positive audit (the x63/x62 discipline applied to
    * this tier): probe a relation of KNOWN-ABSENT terms and report
    * the realized flag rate in floored ppm, beside the filter's fill
    * ratio — the two numbers a sizing decision reads. One row:
    * (n_bits_set, fill_ppm, n_absent, n_flagged, fp_ppm). */
  def fpAudit(filter: DataFrame, absent: DataFrame, termCol: Column,
      k: Int = 7, bits: Long = 1L << 20, salt: String = "bloom"): DataFrame = {
    val flagged = probe(filter, absent, termCol, k, bits, salt)
    // distinct for the same reason as probe: n_bits_set must count
    // SET BITS, not sidecar rows, or fill_ppm overstates the filter
    val nSet = filter.select(col("bit")).distinct()
      .agg(count(lit(1)).as("n_bits_set"))
    flagged.agg(count(lit(1)).as("n_absent"),
        coalesce(sum(when(col("maybe_present"), 1L).otherwise(0L)), lit(0L))
          .as("n_flagged"))
      .crossJoin(broadcast(nSet))
      .select(col("n_bits_set"),
        expr(s"(n_bits_set * CAST(1000000 AS BIGINT)) DIV " +
          s"CAST($bits AS BIGINT)").as("fill_ppm"),
        col("n_absent"), col("n_flagged"),
        expr("""CAST(CASE WHEN n_absent = 0 THEN NULL
          ELSE (n_flagged * CAST(1000000 AS BIGINT)) DIV n_absent
          END AS BIGINT)""").as("fp_ppm"))
  }
}

/** KMV (k-minimum-values / bottom-k) SKETCH with the same portable
  * hash family — the third leg of the sketch stack: HLL (q27) counts
  * distincts opaquely, CountMin (x108) counts frequencies, KMV counts
  * distincts AND — unlike HLL — supports SET OPERATIONS: union,
  * Jaccard, and intersection estimates between corpora, because the
  * sketch is an actual uniform sample of the hashed key space
  * (Beyer et al. 2007; Bar-Yossef et al. 2002). That is the question
  * a 100 TB curator actually asks across sources: "how much does
  * crawl B overlap crawl A?" — answered from two k-row sketches, no
  * corpus join.
  *
  * Representation: the k SMALLEST distinct md5-60 hash values of the
  * key relation, as a relation (hv BIGINT, ≤ k rows) — mergeable by
  * union + re-take-bottom-k (grown == one-shot exactly, since
  * bottom-k of bottom-k unions is bottom-k of the union), and every
  * value replays in external SQL (the x114/x115 oracles re-derive the
  * whole sketch ORDER BY hash LIMIT k).
  *
  * Plan shape: build = hash-distinct then a distributed
  * TakeOrderedAndProject (per-partition bottom-k, driver merges k
  * rows — no global sort shuffle). Estimates are k-row joins.
  * Estimator: with fewer than k values held the count is EXACT;
  * otherwise n̂ = (k−1)·M / h_k with M = 2^60 (floored integer math
  * in DECIMAL(38,0) — the house overflow discipline). */
object Kmv {

  /** Hash-space size: md5-60 values are uniform in [0, 2^60). */
  val M: Long = 1L << 60

  /** Portable draw for `term` under `salt`: md5-60 of "salt:term". */
  def hash(term: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), term)), 1, 15), 16, 10)
      .cast("long")

  /** Build: the k smallest distinct hash values of `termCol`. */
  def build(df: DataFrame, termCol: Column, k: Int = 256,
      salt: String = "kmv"): DataFrame =
    df.select(hash(termCol, salt).as("hv")).distinct()
      .orderBy("hv").limit(k)

  /** Merge sketches built with the SAME (k, salt): union + bottom-k
    * again — order-free, so the grown sketch is row-identical to one
    * built over the concatenated input. */
  def merge(sketches: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(sketches.nonEmpty, "Kmv.merge: need at least one sketch")
    sketches.reduce(_.unionByName(_)).distinct().orderBy("hv").limit(k)
  }

  /** Distinct-count estimate, one row: (n_held, h_k, kmv_est).
    * n_held < k means the sketch saw the whole key space — the
    * "estimate" is exact; otherwise (k−1)·M div h_k. */
  def distinctEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.agg(count(lit(1)).as("n_held"), max(col("hv")).as("h_k"))
      .select(col("n_held"), col("h_k"),
        when(col("n_held") < k, col("n_held"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($M AS DECIMAL(38,0)))" +
              " DIV CAST(h_k AS DECIMAL(38,0)) AS BIGINT)"))
          .as("kmv_est"))

  /** Set-operation estimates from two sketches with the same
    * (k, salt), one row: (n_held, h_k, union_est, k_both,
    * jaccard_ppm, intersect_est). The union sketch is the bottom-k of
    * the two sketches' union; `k_both` counts its members present in
    * BOTH input sketches — k_both / n_held estimates Jaccard
    * (a uniform sample of A∪B's hash space), and Jaccard × union_est
    * estimates |A∩B|. All floored integer math, replayable. */
  /** Per-group KMV sketches in ONE bounded hash aggregate:
    * (g, hv) rows, ≤ k per group. The aggregate is
    * [[graft.functions.BottomKLongs]] — partial map-side, ≤ k Longs
    * per (group, task) in the shuffle, no per-group sort (the
    * `row_number() OVER (PARTITION BY g ORDER BY hv)` alternative
    * sorts every group's full key stream). */
  def groupedBuild(df: DataFrame, groupCol: Column, termCol: Column,
      k: Int = 256, salt: String = "kmv"): DataFrame =
    df.select(groupCol.as("g"), hash(termCol, salt).as("__hv"))
      .groupBy("g")
      .agg(graft.functions.BottomKLongs.column(col("__hv"), k).as("__sk"))
      .select(col("g"), explode(col("__sk")).as("hv"))

  /** Merge [[groupedBuild]] relations built with the SAME (k, salt):
    * union, then per-group bottom-k again through the bounded
    * aggregate — grown == one-shot row-identically (bottom-k of
    * bottom-k unions is bottom-k of the union), and IDEMPOTENT
    * (re-merging an already-folded batch is a set union — a crash
    * replay cannot corrupt the sketch, unlike count states). */
  def mergeGrouped(sketches: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(sketches.nonEmpty, "Kmv.mergeGrouped: need at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy("g")
      .agg(graft.functions.BottomKLongs.column(col("hv"), k).as("__sk"))
      .select(col("g"), explode(col("__sk")).as("hv"))
  }

  /** Per-group distinct-count estimates from a [[groupedBuild]]
    * relation: (g, n_held, ndv_est) — NDV-per-group in bounded memory
    * per group, the grouped twin of [[distinctEstimate]] (exact below
    * k, (k−1)·M div h_k above). Pure sketch-land arithmetic. */
  def groupedDistinct(sketches: DataFrame, k: Int = 256): DataFrame =
    sketches.groupBy("g")
      .agg(count(lit(1)).as("n_held"), max(col("hv")).as("h_k"))
      .select(col("g"), col("n_held"),
        when(col("n_held") < k, col("n_held"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($M AS DECIMAL(38,0)))" +
              " DIV CAST(h_k AS DECIMAL(38,0)) AS BIGINT)"))
          .as("ndv_est"))

  /** VALUE-CARRYING bottom-k sample — the QUANTILE leg of the sketch
    * stack (HLL/KMV count distincts, CountMin counts frequencies;
    * this estimates ORDER STATISTICS): the k rows whose KEY hashes
    * are smallest, keeping a value column. Because the hash order is
    * independent of the value, the kept rows are a uniform row sample
    * of the relation, so sample order statistics estimate the
    * population's (Bar-Yossef et al. 2002's bottom-k sampling view).
    * Mergeable across DISJOINT intake batches with unique keys by
    * union + re-bottom-k ([[mergeValues]] — grown == one-shot
    * row-identically). Ties on hv break by v, so the sketch is
    * deterministic and an external engine replays it exactly
    * (ORDER BY hv, v LIMIT k). Build is a distributed
    * TakeOrderedAndProject — per-partition bottom-k, no global sort
    * shuffle. */
  def valueSketch(df: DataFrame, keyCol: Column, valueCol: Column,
      k: Int = 256, salt: String = "kmvq"): DataFrame =
    df.select(hash(keyCol, salt).as("hv"), valueCol.cast("long").as("v"))
      .orderBy("hv", "v").limit(k)

  /** Merge [[valueSketch]] relations built with the SAME (k, salt)
    * over DISJOINT inputs with unique keys: union + bottom-k again. */
  def mergeValues(sketches: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(sketches.nonEmpty, "Kmv.mergeValues: need at least one sketch")
    sketches.reduce(_.unionByName(_)).orderBy("hv", "v").limit(k)
  }

  /** Quantile estimates from a [[valueSketch]] relation: one row per
    * requested quantile (q_ppm, est_v) with est_v = the sample value
    * at 1-based rank (q_ppm · (n−1)) div 10⁶ + 1 in value order —
    * the lower order statistic, pure floored integer algebra, so an
    * external oracle replays the estimator exactly. The unpartitioned
    * row_number window runs over ≤ k rows (sketch-land, never
    * corpus-land). */
  def quantileEstimate(sketch: DataFrame, qsPpm: Seq[Long]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val ranked = sketch.select(col("v")).withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("v")))
    val n = sketch.agg(count(lit(1)).as("n"))
    qsPpm.toDF("q_ppm").crossJoin(broadcast(n))
      .withColumn("rk",
        expr("CAST((q_ppm * (n - 1)) DIV 1000000 AS INT) + 1"))
      .join(ranked, Seq("rk"))
      .select(col("q_ppm"), col("v").as("est_v"))
  }

  /** Per-GROUP value sketches in one bounded pass — the grouped twin
    * of [[valueSketch]]: bottom-k key hashes per group via the native
    * [[graft.functions.BottomKLongs]] aggregate (map-side partial,
    * ≤ k Longs per group·task in the shuffle, no per-group sort),
    * then the kept (g, hv) rows pull their values back through ONE
    * equi-join against the hashed base. Hash order is independent of
    * the value, so each group's kept rows are a uniform row sample of
    * that group. Duplicate keys collapse to one (g, hv) row carrying
    * the minimum value (deterministic, externally replayable). */
  def groupedValueSketch(df: DataFrame, groupCol: Column, keyCol: Column,
      valueCol: Column, k: Int = 256, salt: String = "kmvq"): DataFrame = {
    val base = df.select(groupCol.as("g"), hash(keyCol, salt).as("hv"),
      valueCol.cast("long").as("v"))
    val kept = base.groupBy("g")
      .agg(graft.functions.BottomKLongs.column(col("hv"), k).as("__sk"))
      .select(col("g"), explode(col("__sk")).as("hv"))
    kept.join(base, Seq("g", "hv")).groupBy("g", "hv").agg(min("v").as("v"))
  }

  /** Per-group quantile estimates from a [[groupedValueSketch]]
    * relation: one row per (g, q_ppm) with the group-sample's lower
    * order statistic at rank (q_ppm · (n−1)) div 10⁶ + 1 — the
    * per-source distribution profile (length/score quantiles by
    * source/month/shard) in sketch-land arithmetic: the window and
    * joins run over ≤ G·k rows, never the corpus. */
  def groupedQuantileEstimate(sketch: DataFrame,
      qsPpm: Seq[Long]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val ranked = sketch.select(col("g"), col("hv"), col("v"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("v", "hv")))
    val ns = sketch.groupBy("g").agg(count(lit(1)).as("n"))
    ns.crossJoin(broadcast(qsPpm.toDF("q_ppm")))
      .withColumn("rk",
        expr("CAST((q_ppm * (n - 1)) DIV 1000000 AS INT) + 1"))
      .join(ranked, Seq("g", "rk"))
      .select(col("g"), col("q_ppm"), col("v").as("est_v"))
  }

  /** The OVERLAP MATRIX over a [[groupedBuild]] relation: one row per
    * unordered group pair (ga < gb) with (n_held, k_both, union_est,
    * jaccard_ppm, intersect_est) — "how much does each source/month/
    * shard overlap each other" answered entirely from the model-sized
    * sketch relation (≤ G·k rows): the corpus is scanned ONCE, by
    * groupedBuild; everything here is G²-bounded arithmetic. Per
    * pair, the union sketch is the bottom-k of the two sketches'
    * union (the window runs over ≤ G²·2k rows — sketch-land, never
    * corpus-land), and members present in both sketches estimate the
    * overlap, exactly as [[setOps]]. */
  def pairwiseOverlap(sketches: DataFrame, k: Int = 256): DataFrame = {
    val gs = sketches.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("ga"))
      .join(gs.select(col("g").as("gb")), col("ga") < col("gb"))
    val sa = sketches.select(col("g").as("ga"), col("hv"))
    val sb = sketches.select(col("g").as("gb"), col("hv"))
    val tagged = pairs.join(sa, Seq("ga"))
      .select(col("ga"), col("gb"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(sb, Seq("gb"))
        .select(col("ga"), col("gb"), col("hv"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ga", "gb", "hv")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ga", "gb").orderBy("hv")
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_held"), max(col("hv")).as("h_k"),
        sum(col("in_a") * col("in_b")).cast("long").as("k_both"))
      .select(col("ga"), col("gb"), col("n_held"), col("k_both"),
        when(col("n_held") < k, col("n_held"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($M AS DECIMAL(38,0)))" +
              " DIV CAST(h_k AS DECIMAL(38,0)) AS BIGINT)"))
          .as("union_est"))
      .select(col("ga"), col("gb"), col("n_held"), col("k_both"),
        col("union_est"),
        expr("""CAST(CASE WHEN n_held = 0 THEN NULL
          ELSE (k_both * CAST(1000000 AS BIGINT)) DIV n_held
          END AS BIGINT)""").as("jaccard_ppm"),
        expr("""CAST(CASE WHEN n_held = 0 THEN 0
          ELSE (CAST(k_both AS DECIMAL(38,0)) *
                CAST(union_est AS DECIMAL(38,0)))
               DIV CAST(n_held AS DECIMAL(38,0))
          END AS BIGINT)""").as("intersect_est"))
  }

  def setOps(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val u = merge(Seq(a, b), k)
    u.join(broadcast(a.select(col("hv"), lit(1).as("__a"))), Seq("hv"), "left_outer")
      .join(broadcast(b.select(col("hv"), lit(1).as("__b"))), Seq("hv"), "left_outer")
      .agg(count(lit(1)).as("n_held"), max(col("hv")).as("h_k"),
        coalesce(sum(when(col("__a").isNotNull && col("__b").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("k_both"))
      .select(col("n_held"), col("h_k"), col("k_both"),
        when(col("n_held") < k, col("n_held"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($M AS DECIMAL(38,0)))" +
              " DIV CAST(h_k AS DECIMAL(38,0)) AS BIGINT)"))
          .as("union_est"))
      .select(col("n_held"), col("h_k"), col("union_est"), col("k_both"),
        expr("""CAST(CASE WHEN n_held = 0 THEN NULL
          ELSE (k_both * CAST(1000000 AS BIGINT)) DIV n_held
          END AS BIGINT)""").as("jaccard_ppm"),
        expr("""CAST(CASE WHEN n_held = 0 THEN 0
          ELSE (CAST(k_both AS DECIMAL(38,0)) *
                CAST(union_est AS DECIMAL(38,0)))
               DIV CAST(n_held AS DECIMAL(38,0))
          END AS BIGINT)""").as("intersect_est"))
  }
}
