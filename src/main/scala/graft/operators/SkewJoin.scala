package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * already splits oversized sort-merge partitions at runtime, and is
  * the first line of defense at scale. Salting is the explicit,
  * planner-independent fallback for the pathological case AQE can't
  * fix: ONE join key so hot that a single key's rows exceed an
  * executor (e.g. the empty-string user id owning 5% of 100 TB).
  *
  * Mechanics: the skewed (fact) side gets a uniform random-ish salt in
  * [0, buckets) derived deterministically from a unique column (so
  * reruns are stable); the small (dim) side is replicated `buckets`
  * times via explode. The join key becomes (key, salt): each hot key
  * now spreads over `buckets` reducers. Correctness is unchanged —
  * every fact row still meets every matching dim row exactly once.
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `keys`, salted `buckets`
    * ways. `saltSource` must be a column of `fact` (ideally unique —
    * only uniformity matters, not uniqueness). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSource: String, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** JOIN-SIZE PREFLIGHT: the exact output cardinality an inner
    * equi-join WOULD produce — Σ over matched keys of
    * count_left(k) · count_right(k) — plus the heaviest contributing
    * key, computed from two key hash aggs and a key-count-sized join
    * (never the join itself). The number a pipeline checks before
    * committing a cluster to a join that might be 10⁶× its inputs
    * (the classic silent-cartesian-by-hot-key accident); the
    * `max_key_rows` / `max_key` columns say whether one key owns the
    * blow-up (→ salt it, [[saltedInnerJoin]]) or the join is just
    * big. Output 1 row: (join_rows, matched_keys, max_key_rows,
    * max_key). Empty/no-overlap inputs read zeros and a null key.
    *
    * Overflow discipline: per-key products and their sum are computed
    * in DECIMAL(38,0) (two Long key counts can multiply past
    * Long.MaxValue — exactly the catastrophic case this preflight
    * exists to catch; sessions run non-ANSI, so Long math would WRAP
    * silently and under-report). The reported BIGINTs saturate at
    * Long.MaxValue instead of wrapping — a preflight reading
    * 9223372036854775807 means "at least this many", which is already
    * an unambiguous do-not-run answer. */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    val l = left.groupBy(col(keyCol)).agg(count(lit(1)).as("__cl"))
    val r = right.groupBy(col(keyCol)).agg(count(lit(1)).as("__cr"))
    l.join(r, Seq(keyCol))
      // DECIMAL(38,0) product: |cl|,|cr| <= ~9.2e18 so cl*cr <= ~8.5e37
      // always fits — exact, never wraps
      .select(col(keyCol),
        (col("__cl").cast("decimal(38,0)") * col("__cr")).as("__rows"))
      .agg(
        coalesce(sum(col("__rows")), lit(0L).cast("decimal(38,0)"))
          .as("__join_rows"),
        count(lit(1)).as("matched_keys"),
        coalesce(max(col("__rows")), lit(0L).cast("decimal(38,0)"))
          .as("__max_key_rows"),
        // deterministic even under contribution ties: (rows, key) max
        max(struct(col("__rows").as("r"), col(keyCol).as("k")))
          .getField("k").as("max_key"))
      .select(
        least(col("__join_rows"), lit(Long.MaxValue)).cast("long")
          .as("join_rows"),
        col("matched_keys"),
        least(col("__max_key_rows"), lit(Long.MaxValue)).cast("long")
          .as("max_key_rows"),
        col("max_key"))
  }

  /** SKEW PREFLIGHT — the measurement that decides whether
    * [[saltedInnerJoin]] (or a bucket bump) is needed at all: the k
    * heaviest values of a prospective join/group key, each with its
    * exact corpus share and its load relative to a uniform key
    * (`skew_ppm` = count / (total/distinct-keys) in floored ppm;
    * 1,000,000 = exactly uniform, 20,000,000 = this key carries 20×
    * a fair share — size reducers for THAT).
    *
    * Shape: one hash agg over the key (map-side combine) → 1-row
    * (total, distinct-count) aggregate broadcast → top-k as a bounded
    * heap (TakeOrderedAndProject) → rank window over the K-ROW result
    * only. The key space never sorts globally and nothing returns to
    * the driver. All integers exact; ties break by key ascending.
    * `skew_ppm` = floor(c·k·1e6 / n) is computed with the split-
    * quotient identity q·1e6 + (r·1e6 DIV n) over DECIMAL(38,0)
    * intermediates (q = c·k DIV n ≤ k, r = c·k MOD n < n), so no step
    * can exceed ~9.3e24 — exact at any corpus size, saturating at
    * Long.MaxValue rather than wrapping under non-ANSI Long math.
    * Output: (rank, <key>, c, share_ppm, skew_ppm). */
  def heavyKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"heavyKeys: k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("__n"), count(lit(1)).as("__k"))
    val topk = counts.orderBy(col("c").desc, col(keyCol).asc).limit(k)
    val w = Window.orderBy(col("c").desc, col(keyCol).asc)
    topk.crossJoin(broadcast(totals))
      .select(row_number().over(w).as("rank"), col(keyCol), col("c"),
        // c <= n, so c*1e6 <= n*1e6 — can pass Long for n > 9.2e12 rows;
        // the DECIMAL(38,0) widening holds it exactly (<= ~9.2e24)
        expr("""CAST((CAST(c AS DECIMAL(38,0)) * 1000000) DIV __n
          AS BIGINT)""").as("share_ppm"),
        // floor(c*k*1e6/n) without ever forming c*k*1e6: with
        // ck = c*k (DECIMAL(38,0), exact), q = ck DIV n, r = ck MOD n,
        // floor(ck*1e6/n) = q*1e6 + floor(r*1e6/n); every intermediate
        // fits DECIMAL(38,0), and the final read saturates at
        // Long.MaxValue instead of wrapping
        expr(s"""CAST(LEAST(
            CAST((CAST(c AS DECIMAL(38,0)) * __k) DIV __n AS DECIMAL(38,0))
              * 1000000
            + (CAST((CAST(c AS DECIMAL(38,0)) * __k) % __n AS DECIMAL(38,0))
              * 1000000) DIV __n,
            ${Long.MaxValue}) AS BIGINT)""").as("skew_ppm"))
  }
}
