package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog part 1: the reference-parity pipeline operators (q01-q40) —
  * scan/normalize/cast/dedup/join/impute/window/streaming shapes.
  *
  * Split from the single-file Catalog at r13 (8.9k lines and growing
  * ~700/round); [[Catalog.entries]] concatenates the parts in the
  * original order, so the driver contract (queries/oracleSql/
  * headlines) is untouched. */
private[graft] object CatalogPipeline {

  import Tables._
  import CatalogShared._

  val defs: Seq[QueryDef] = Seq(


    // ----------------------------------------------------- S5/S8 + pushdown
    QueryDef("q01_scan_project",
      (s, d) => lineitem(s, d)
        .where(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-06-01'
              ORDER BY l_orderkey, l_linenumber LIMIT 100""")),

    // ------------------------------------------------- O1 normalization (data-side)
    QueryDef("q02_normalize_names",
      (s, d) => region(s, d)
        .select(col("r_regionkey"),
          TextAnalysis.normalizeText(col("r_name")).as("norm_name"))
        .orderBy("r_regionkey"),
      Some("""SELECT r_regionkey,
                trim(regexp_replace(lower(r_name), '[^a-z0-9]+', ' ', 'g')) AS norm_name
              FROM region ORDER BY r_regionkey""")),

    // ------------------------------------------------- O2 two-format cast
    QueryDef("q03_cast_two_format",
      (s, d) => {
        val e = events(s, d).where(col("event_id") < 1000)
        val raw = when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyy/MM/dd HH:mm:ss"))
          .otherwise(date_format(col("ts"), "yyyy/MM/dd"))
        val parsed = coalesce(
          try_to_timestamp(raw, lit("yyyy/MM/dd HH:mm:ss")),
          try_to_timestamp(raw, lit("yyyy/MM/dd")))
        e.select(col("event_id"),
            date_format(parsed, "yyyy-MM-dd HH:mm:ss").as("parsed_ts"),
            substring(col("props"), 1, 3).try_cast("double").as("bad_double"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
                strftime(coalesce(
                  try_strptime(raw, '%Y/%m/%d %H:%M:%S'),
                  try_strptime(raw, '%Y/%m/%d')), '%Y-%m-%d %H:%M:%S') AS parsed_ts,
                TRY_CAST(substring(props, 1, 3) AS DOUBLE) AS bad_double
              FROM (SELECT event_id, props,
                      CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
                           ELSE strftime(ts, '%Y/%m/%d') END AS raw
                    FROM events WHERE event_id < 1000) t
              ORDER BY event_id""")),

    // ------------------------------------------------- O3 empty-row filter
    QueryDef("q04_empty_filter",
      (s, d) => documents(s, d)
        .where(length(trim(col("text"))) > 0)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs FROM documents
              WHERE length(trim(text)) > 0 GROUP BY source ORDER BY source""")),

    // ------------------------------------------------- O5 whole-row distinct
    QueryDef("q05_distinct",
      (s, d) => lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------- K5 first-per-key dedup
    QueryDef("q06_first_per_key",
      (s, d) => {
        // (l_orderkey, l_linenumber) is NOT unique in this data — the
        // survivor order must be total for deterministic first-wins.
        // Aggregate form (min-of-struct): hash agg with map-side
        // combine, no per-partition sort — the survivor equals the
        // window row_number()=1 row under the same column order.
        AirQuality.firstPerKeyAgg(
            lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
              "l_suppkey", "l_extendedprice", "l_quantity"),
            Seq("l_orderkey"))
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
              FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
                    FROM lineitem) t
              WHERE rn = 1 ORDER BY l_orderkey"""),
      headline = true),

    // ------------------------------------------------- O6/O7 drop + prefix rename
    QueryDef("q07_prefix_rename",
      (s, d) => {
        val sup = supplier(s, d).drop("s_acctbal")
        val renamed = sup.columns.foldLeft(sup) { (df, c) =>
          if (c == "s_suppkey") df else df.withColumnRenamed(c, s"sup_$c")
        }
        renamed.orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name AS sup_s_name, s_nationkey AS sup_s_nationkey
              FROM supplier ORDER BY s_suppkey""")),

    // ------------------------------------------------- J1 N-way full outer join
    QueryDef("q08_full_outer_nway",
      (s, d) => {
        // one (suppkey, flag) aggregate expression feeds all three join
        // sides. NOTE measured reality: Catalyst pushes the flag filter
        // BELOW the aggregate (predicate on a grouping column), so the
        // physical plan still has three scans — this shape is kept for
        // its clarity, not a claimed scan-sharing win; the genuine
        // one-pass shape is goldJoinFromMaterializedBase (write the
        // base aggregate to the lake, build the sides from the
        // read-back — plan-tested to scan lineitem exactly once)
        val base = lineitem(s, d)
          .groupBy(col("l_suppkey"), col("l_returnflag"))
          .agg(dsum(col("l_quantity")).as("qty"))
        def side(flag: String, alias: String) = base
          .where(col("l_returnflag") === flag)
          .select(col("l_suppkey"), col("qty").as(s"${alias}_qty"))
        Seq(side("A", "a"), side("N", "n"), side("R", "r"))
          .reduce(_.join(_, Seq("l_suppkey"), "full_outer"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, a_qty, n_qty, r_qty FROM
                (SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS a_qty
                 FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_suppkey) a
              FULL JOIN
                (SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS n_qty
                 FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_suppkey) n USING (l_suppkey)
              FULL JOIN
                (SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS r_qty
                 FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_suppkey) r USING (l_suppkey)
              ORDER BY l_suppkey"""),
      headline = true),

    // ------------------------------------------------- A1/A2 mean imputation
    QueryDef("q09_mean_impute",
      (s, d) => {
        val li = lineitem(s, d).withColumn("v",
          when(col("l_linenumber") === 1, lit(null)).otherwise(col("l_quantity")))
        // global mean via a 1-row agg cross-joined back (scales: no
        // empty-partition window, no driver collect in the plan)
        val mean = li.agg(avg("v").as("mean_v"))
        li.crossJoin(broadcast(mean))
          .withColumn("imputed", coalesce(col("v"), col("mean_v")))
          .groupBy("l_suppkey")
          .agg(round(sum("imputed"), 2).as("sum_imputed"), count(lit(1)).as("n"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey,
                round(SUM(coalesce(v, mean_v)), 2) AS sum_imputed,
                count(*) AS n
              FROM (SELECT l_suppkey, v, AVG(v) OVER () AS mean_v
                    FROM (SELECT l_suppkey,
                            CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity END AS v
                          FROM lineitem) t) t2
              GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // ------------------------------------------------- O9 unit-factor map multiply
    QueryDef("q10_unit_convert",
      (s, d) => {
        val factors = typedlit(Map("A" -> 1e-3, "N" -> 1e-6, "R" -> 1e-9))
        lineitem(s, d)
          .withColumn("g", col("l_quantity") * element_at(factors, col("l_returnflag")))
          .groupBy("l_returnflag")
          .agg(round(sum("g"), 6).as("sum_g"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
                round(SUM(l_quantity * CASE l_returnflag
                  WHEN 'A' THEN 1e-3 WHEN 'N' THEN 1e-6 WHEN 'R' THEN 1e-9 END), 6) AS sum_g,
                count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------- W3 ffill/bfill
    QueryDef("q11_ffill_bfill",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val e = events(s, d).withColumn("v",
          when(col("event_type") === "click", col("value")))
        val filled = coalesce(
          last("v", ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0)),
          first("v", ignoreNulls = true).over(w.rowsBetween(0, Window.unboundedFollowing)))
        e.withColumn("filled", filled)
          .groupBy("user_id")
          .agg(round(sum("filled"), 4).as("sum_filled"),
            count(col("filled")).as("n_filled"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, round(SUM(filled), 4) AS sum_filled,
                count(filled) AS n_filled
              FROM (SELECT user_id,
                      coalesce(
                        last_value(v IGNORE NULLS) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        first_value(v IGNORE NULLS) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS filled
                    FROM (SELECT user_id, ts, event_id,
                            CASE WHEN event_type = 'click' THEN value END AS v
                          FROM events) t) t2
              GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------- A3 row-wise NaN-skipping sum
    QueryDef("q12_rowwise_total",
      (s, d) => {
        val li = lineitem(s, d)
        val terms = Seq(
          when(col("l_linenumber") === 1, lit(null)).otherwise(col("l_extendedprice")),
          when(col("l_returnflag") === "A", lit(null)).otherwise(col("l_tax") * 1000),
          when(col("l_discount") > 0.05, col("l_discount") * 100))
        val total = terms.map(t => coalesce(t.cast("decimal(18,4)"), lit(0).cast("decimal(18,4)"))).reduce(_ + _)
        li.withColumn("row_total", total)
          .groupBy("l_returnflag")
          .agg(sum("row_total").cast("double").as("sum_total"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
                CAST(SUM(
                  coalesce(CAST(CASE WHEN l_linenumber = 1 THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)), 0)
                + coalesce(CAST(CASE WHEN l_returnflag = 'A' THEN NULL ELSE l_tax * 1000 END AS DECIMAL(18,4)), 0)
                + coalesce(CAST(CASE WHEN l_discount > 0.05 THEN l_discount * 100 END AS DECIMAL(18,4)), 0)
                ) AS DOUBLE) AS sum_total,
                count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------- W1 lag-6 diff
    QueryDef("q13_lag_diff",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val lagged = coalesce(lag("value", 6).over(w), col("value"))
        events(s, d)
          .withColumn("diff6", col("value") - lagged)
          .groupBy("user_id")
          .agg(round(sum(abs(col("diff6"))), 4).as("sum_abs_diff"), count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, round(SUM(abs(diff6)), 4) AS sum_abs_diff, count(*) AS n
              FROM (SELECT user_id,
                      value - coalesce(lag(value, 6) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id), value) AS diff6
                    FROM events) t
              GROUP BY user_id ORDER BY user_id"""),
      headline = true),

    // ------------------------------------------------- W2 lag-6 pct change
    QueryDef("q14_pct_change",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val lag6 = lag("value", 6).over(w)
        val pct = when(lag6 =!= 0, (col("value") - lag6) / lag6 * 100)
        events(s, d)
          .withColumn("pct", pct)
          .groupBy("user_id")
          .agg(round(sum("pct"), 4).as("sum_pct"), count(col("pct")).as("n_pct"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, round(SUM(pct), 4) AS sum_pct, count(pct) AS n_pct
              FROM (SELECT user_id,
                      CASE WHEN lag6 <> 0 THEN (value - lag6) / lag6 * 100 END AS pct
                    FROM (SELECT user_id, value, lag(value, 6) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) AS lag6
                          FROM events) t) t2
              GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------- union all + distinct
    QueryDef("q15_union_dedup",
      (s, d) => {
        val o = orders(s, d)
        val a = o.where(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
        val b = o.where(col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
        a.unionByName(b).distinct()
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n FROM
                (SELECT DISTINCT * FROM
                  (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000) u) t
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------- sort + limit (top-k)
    QueryDef("q16_topk",
      (s, d) => orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("o_orderstatus")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderstatus
              FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ------------------------------------------------- string functions
    QueryDef("q17_string_funcs",
      (s, d) => part(s, d).where(col("p_partkey") < 500)
        .select(col("p_partkey"),
          lower(col("p_name")).as("lo"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
          length(col("p_name")).as("len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_name) AS lo,
                string_split(p_name, ' ')[1] AS first_word,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
                length(p_name) AS len,
                concat_ws('|', p_brand, p_type) AS brand_type
              FROM part WHERE p_partkey < 500 ORDER BY p_partkey""")),

    // ------------------------------------------------- date functions
    QueryDef("q18_date_funcs",
      (s, d) => orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("ym"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              FROM orders GROUP BY 1 ORDER BY ym""")),

    // ------------------------------------------------- headline agg (TPC-H Q1 shape)
    QueryDef("q19_agg_pricing",
      (s, d) => lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // round after the exact-decimal sum: the 8-decimal product sum
          // lands between adjacent doubles, and Spark/DuckDB pick
          // different neighbors in the final cast
          round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double"), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                     (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
                round(AVG(l_quantity), 4) AS avg_qty,
                round(AVG(l_discount), 4) AS avg_disc,
                count(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ------------------------------------------------- star join (broadcast dims)
    QueryDef("q20_star_join",
      (s, d) => lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double"), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("r_name"),
      Some("""SELECT r_name,
                round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                     (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
                count(*) AS n
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name ORDER BY r_name"""),
      headline = true),

    // ------------------------------------------------- semi/anti join
    QueryDef("q21_anti_join",
      (s, d) => customer(s, d)
        .join(orders(s, d).where(year(col("o_orderdate")) === 1995),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
              ORDER BY c_custkey""")),

    // ------------------------------------------------- window rank per group
    QueryDef("q22_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        orders(s, d)
          .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"), col("rk"))
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
                    FROM orders) t
              WHERE rk <= 3 ORDER BY o_custkey, rk""")),

    // ------------------------------------------------- tumbling time window
    QueryDef("q23_tumbling_window",
      // decimal-exact sums: double accumulation order differs between
      // engines and flips round(x, 4) on ties at larger SFs (the
      // streaming/batch twin windowedAggBatch is exercised by
      // StreamingSpec; this oracle query needs order-independent math)
      // no avg column: round() tie-breaking on a computed average
      // differs between engines (Spark rounds the exact binary value,
      // DuckDB rounds a rescaled double) — (sum_v, n) pins the result
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy("hour_start", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                event_type, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
              FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""),
      headline = true),

    QueryDef("q40_sliding_window",
      // sliding (hopping) window: 1h windows every 15min — each event
      // lands in exactly size/slide = 4 windows, so the oracle replays
      // the assignment as an explicit 4-way fan-out from the 15-min
      // bucket; decimal-exact sums as in q23
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("n"), col("sum_v"))
        .orderBy("w_start"),
      Some("""SELECT strftime(w_start0, '%Y-%m-%d %H:%M:%S') AS w_start,
                count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
              FROM (
                SELECT value,
                  date_trunc('hour', ts) + INTERVAL 15 MINUTE *
                    ((EXTRACT(minute FROM ts) // 15) - k) AS w_start0
                FROM events, range(0, 4) t(k))
              GROUP BY 1 ORDER BY w_start""")),

    // ------------------------------------------------- as-of join
    QueryDef("q24_asof_join",
      (s, d) => {
        val e = events(s, d).select("event_id", "ts", "user_id")
        val o = orders(s, d)
          .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
          .agg(max("o_orderkey").as("last_order"))
        AsOfJoin.asOf(e, o, Seq("user_id"), "ts", "o_orderdate")
          .select(col("event_id"), col("user_id"), col("last_order"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, o.last_order
              FROM events e ASOF LEFT JOIN
                (SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_order
                 FROM orders GROUP BY 1, 2) o
              ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
              ORDER BY e.event_id"""),
      headline = true),

    // ------------------------------------------------- rollup (subtotals)
    QueryDef("q25_rollup",
      (s, d) => lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping("l_returnflag").as("g_rf"), grouping("l_linestatus").as("g_ls"),
          dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
                GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                count(*) AS n
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST""")),

    // ------------------------------------------------- cube (all combos)
    QueryDef("q26_cube",
      (s, d) => orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .cube("o_orderstatus", "yr")
        .agg(grouping("o_orderstatus").as("g_st"), grouping("yr").as("g_yr"),
          dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(col("g_st"), col("g_yr"), col("o_orderstatus"), col("yr")),
      Some("""SELECT o_orderstatus, yr,
                GROUPING(o_orderstatus) AS g_st, GROUPING(yr) AS g_yr,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                count(*) AS n
              FROM (SELECT o_orderstatus, year(o_orderdate) AS yr, o_totalprice
                    FROM orders) t
              GROUP BY CUBE (o_orderstatus, yr)
              ORDER BY g_st, g_yr, o_orderstatus NULLS LAST, yr NULLS LAST""")),

    // ------------------------------------------------- sketch: approx distinct
    // Spark's HLL++ and DuckDB's sketch differ, so the approximate
    // value itself can't hash-match; the portable correctness claim is
    // "approx within 5% of exact", asserted Spark-side and emitted as
    // a boolean the oracle states as a constant.
    QueryDef("q27_approx_distinct",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("n_approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact") <= 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
                true AS approx_ok
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------- salted skew join
    QueryDef("q28_salted_join",
      (s, d) => SkewJoin.saltedInnerJoin(
          lineitem(s, d), supplier(s, d).withColumnRenamed("s_suppkey", "l_suppkey"),
          Seq("l_suppkey"), saltSource = "l_orderkey", buckets = 8)
        .groupBy("s_nationkey")
        .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy("s_nationkey"),
      Some("""SELECT s_nationkey,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                count(*) AS n
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ------------------------------------------------- native expression
    QueryDef("q29_unaccent",
      (s, d) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        nation(s, d)
          .select(col("n_nationkey"),
            expr("unaccent(concat('é', n_name, 'ü'))").as("stripped"))
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, strip_accents('é' || n_name || 'ü') AS stripped
              FROM nation ORDER BY n_nationkey""")),

    // ------------------------------------------------- S3 date-range generator
    QueryDef("q30_date_range",
      // reference: last-N-days list starting yesterday
      // (unpacked_to_raw.py:24-29); anchored to a fixed date so the
      // oracle compare is deterministic
      (s, d) => s.range(1)
        .select(explode(sequence(
          lit("1998-11-25").cast("date"), lit("1998-12-01").cast("date"))).as("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
        .orderBy("day"),
      Some("""SELECT strftime(CAST(d AS DATE), '%Y-%m-%d') AS day
              FROM generate_series(DATE '1998-11-25', DATE '1998-12-01',
                                   INTERVAL 1 DAY) t(d)
              ORDER BY day""")),

    // ------------------------------------------------- exact percentiles
    QueryDef("q32_percentile",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
                count(*) AS n
              FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // ------------------------------------------------- JSON extraction
    QueryDef("q33_json",
      (s, d) => events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("k_mod"),
      Some("""SELECT CAST(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS BIGINT) AS k_mod,
                count(*) AS n,
                CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
              FROM events GROUP BY 1 ORDER BY k_mod""")),

    // ------------------------------------------------- bucketed range join
    QueryDef("q34_range_join",
      (s, d) => {
        // events within ±1000s-scaled windows around order "anchors":
        // a genuine interval join, bucketized to an equi-join
        val e = events(s, d)
          .select(col("event_id"), unix_timestamp(col("ts")).as("t"))
        // deterministic 3-day windows spread across the events month
        // (epoch 1704067200 = 2024-01-01 UTC)
        val r = orders(s, d).where(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"),
            (lit(1704067200L) + (col("o_orderkey") % 28) * 86400L).as("w_start"))
          .withColumn("w_end", col("w_start") + 86400L * 3)
        RangeJoin.bucketedRangeJoin(e, r, "t", "w_start", "w_end", 86400 * 3)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_events"), min("event_id").as("first_event"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_events, min(event_id) AS first_event
              FROM (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events) e
              JOIN (SELECT o_orderkey,
                      1704067200 + (o_orderkey % 28) * 86400 AS w_start,
                      1704067200 + (o_orderkey % 28) * 86400 + 86400*3 AS w_end
                    FROM orders WHERE o_orderkey % 97 = 0) r
                ON e.t >= r.w_start AND e.t <= r.w_end
              GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // ------------------------------------------------- pivot
    QueryDef("q35_pivot",
      (s, d) => lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("A", "qty_a").withColumnRenamed("N", "qty_n")
        .withColumnRenamed("R", "qty_r")
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
                CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_a,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_n,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_r
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ------------------------------------------------- set operations
    QueryDef("q36_setops",
      (s, d) => {
        val o = orders(s, d)
        val a = o.where(col("o_orderstatus") === "F").select("o_custkey")
        val b = o.where(col("o_totalprice") > 150000).select("o_custkey")
        val both = a.intersect(b).withColumn("src", lit("both"))
        val onlyA = a.except(b).withColumn("src", lit("only_f"))
        both.unionByName(onlyA)
          .groupBy("src").agg(count(lit(1)).as("n"))
          .orderBy("src")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
                   b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
              SELECT src, count(*) AS n FROM (
                SELECT o_custkey, 'both' AS src FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
                UNION ALL
                SELECT o_custkey, 'only_f' AS src FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) t
              GROUP BY src ORDER BY src""")),

    // ------------------------------------------------- custom typed UDAF
    QueryDef("q37_geomean_udaf",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(udaf(graft.functions.GeoMean).apply(col("l_extendedprice")), 4)
          .as("geo_price"), count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
                count(*) AS n
              FROM lineitem WHERE l_extendedprice > 0
              GROUP BY 1 ORDER BY l_returnflag""")),

    // ------------------------------------------------- batch sessionization
    QueryDef("q38_sessionize",
      (s, d) => EventStream.sessionizeBatch(events(s, d), gapSeconds = 1800)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("total_value"),
          date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
          date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"))
        .orderBy("user_id", "session_seq"),
      Some("""WITH s AS (
                SELECT user_id, event_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                       THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s2 AS (
                SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                FROM s)
              SELECT user_id, session_seq, count(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
                strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
              FROM s2 GROUP BY user_id, session_seq
              ORDER BY user_id, session_seq""")),

    // ------------------------------------------------- hourly resample + ffill
    QueryDef("q39_resample",
      (s, d) => {
        val base = events(s, d).where(col("user_id") < 20)
          .groupBy(col("user_id").cast("string").as("code_site"),
            date_trunc("hour", col("ts")).as("date_de_debut"))
          .agg(round(avg("value"), 4).as("v"))
        AirQuality.resampleHourly(base, Seq("v"))
          .select(col("code_site"),
            date_format(col("date_de_debut"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
            round(col("v"), 4).as("v"), col("is_observed"))
          .orderBy("code_site", "hour_ts")
      },
      Some("""WITH base AS (
                SELECT CAST(user_id AS VARCHAR) AS code_site,
                  date_trunc('hour', ts) AS h, round(avg(value), 4) AS v
                FROM events WHERE user_id < 20 GROUP BY 1, 2),
              spans AS (SELECT code_site, min(h) AS t0, max(h) AS t1
                        FROM base GROUP BY 1),
              grid AS (SELECT code_site, unnest(generate_series(t0, t1,
                         INTERVAL 1 HOUR)) AS h FROM spans),
              j AS (SELECT g.code_site, g.h, b.v,
                      b.v IS NOT NULL AS is_observed
                    FROM grid g LEFT JOIN base b
                      ON g.code_site = b.code_site AND g.h = b.h),
              f AS (SELECT code_site, h, is_observed,
                      last_value(v IGNORE NULLS) OVER (PARTITION BY code_site
                        ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
                    FROM j)
              SELECT code_site, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
                round(v, 4) AS v, is_observed
              FROM f ORDER BY code_site, hour_ts"""))
  )
}
