package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog part 4: canonical TPC-H analytics (q41-q61) interleaved with
  * ANN/PQ tiers, media decode, WebDataset containers.
  *
  * Split from the single-file Catalog at r13 (8.9k lines and growing
  * ~700/round); [[Catalog.entries]] concatenates the parts in the
  * original order, so the driver contract (queries/oracleSql/
  * headlines) is untouched. */
private[graft] object CatalogAnalytics {

  import Tables._
  import CatalogShared._

  val defs: Seq[QueryDef] = Seq(


    QueryDef("q41_shipping_priority",
      // TPC-H Q3 shape (shipping priority): selective dims filtered
      // BEFORE the fact joins (pushdown), revenue as the exact
      // DECIMAL money sum, top-10 as a bounded heap. o_orderpriority
      // stands in for the schema's missing o_shippriority
      (s, d) => customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d)
            .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d)
            .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                o_orderpriority
              FROM customer, orders, lineitem
              WHERE c_mktsegment = 'BUILDING'
                AND c_custkey = o_custkey AND l_orderkey = o_orderkey
                AND o_orderdate < TIMESTAMP '1998-01-01'
                AND l_shipdate > TIMESTAMP '1998-01-01'
              GROUP BY l_orderkey, o_orderdate, o_orderpriority
              ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    QueryDef("q42_local_supplier_volume",
      // TPC-H Q5 shape (local supplier volume): the 6-way star —
      // customer and supplier must share a nation, region filters the
      // nation side; every dimension broadcasts, the two fact tables
      // join on their keys
      (s, d) => customer(s, d)
        .join(orders(s, d)
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(region(s, d).where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM customer, orders, lineitem, supplier, nation, region
              WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
                AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    QueryDef("q43_returned_items",
      // TPC-H Q10 shape (returned-item reporting): quarter window,
      // returnflag filter pushed into the fact scan, customer detail
      // carried through the aggregate, top-20 as a bounded heap
      (s, d) => customer(s, d)
        .join(orders(s, d)
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).where(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 4).as("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                round(c_acctbal, 4) AS c_acctbal, n_name
              FROM customer, orders, lineitem, nation
              WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
                AND c_nationkey = n_nationkey AND l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-04-01'
              GROUP BY c_custkey, c_name, c_acctbal, n_name
              ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    QueryDef("q44_large_orders",
      // TPC-H Q18 shape (large-quantity orders): the HAVING pattern —
      // aggregate the fact, gate on the aggregate, semi-join the
      // qualifying keys back before the dimension join; the qualifying
      // set is tiny so everything after the first agg broadcasts
      (s, d) => {
        val big = lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .where(col("total_qty") > 300.0)
        orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            round(col("o_totalprice"), 4).as("o_totalprice"),
            col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(50)
      },
      Some("""WITH big AS (
                SELECT l_orderkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    AS total_qty
                FROM lineitem GROUP BY 1 HAVING total_qty > 300)
              SELECT c_name, c_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                round(o_totalprice, 4) AS o_totalprice, total_qty
              FROM big JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON o_custkey = c_custkey
              ORDER BY total_qty DESC, o_orderkey LIMIT 50""")),

    QueryDef("x100_image_dims",
      // REAL no-codec image metadata: payloads carry genuine PNG IHDR
      // / GIF screen-descriptor headers with id-derived dimensions;
      // the engine PARSES width/height back from the bytes (substring
      // + hex + conv column algebra — endianness and offsets for
      // real), the oracle replays the dims from the id algebra alone.
      // parse(synthesize(dims)) == dims is the check
      (s, d) => {
        val packed = Multimodal.packFakeImages(
          documents(s, d).where(col("doc_id") < 300), "doc_id")
        packed.select(col("media_id"),
            Multimodal.sniffFormat(col("media")).as("fmt"),
            Multimodal.imageDims(col("media")).getField("width").as("width"),
            Multimodal.imageDims(col("media")).getField("height").as("height"),
            length(col("media")).cast("long").as("n_bytes"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS fmt,
                doc_id % 1920 + 16 AS width,
                (doc_id * 7) % 1080 + 16 AS height,
                CASE WHEN doc_id % 2 = 0 THEN CAST(29 AS BIGINT)
                  ELSE CAST(13 AS BIGINT) END AS n_bytes
              FROM documents WHERE doc_id < 300 ORDER BY media_id""")),

    QueryDef("x101_wav_info",
      // the audio companion: genuine RIFF/WAVE headers with id-derived
      // channels/rate/length; the engine parses them back from the
      // little-endian bytes, duration as the exact integer
      // data·1000 DIV byte_rate; the oracle replays the id algebra
      (s, d) => {
        val packed = Multimodal.packFakeWavs(
          documents(s, d).where(col("doc_id") < 300), "doc_id")
        val info = Multimodal.wavInfo(col("media"))
        packed.select(col("media_id"),
            info.getField("channels").as("channels"),
            info.getField("sample_rate").as("sample_rate"),
            info.getField("duration_ms").as("duration_ms"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                doc_id % 2 + 1 AS channels,
                8000 + (doc_id % 5) * 8000 AS sample_rate,
                ((doc_id % 1000) * 2 + 2) * 1000
                  // ((8000 + (doc_id % 5) * 8000) * (doc_id % 2 + 1) * 2)
                  AS duration_ms
              FROM documents WHERE doc_id < 300 ORDER BY media_id""")),

    QueryDef("q45_promo_revenue",
      // TPC-H Q14 shape (promotion effect): conditional aggregation
      // over the part dimension join — both the promo slice and the
      // total as DECIMAL-exact sums, the ratio formed once at the end
      // in integer ppm (no double-ratio drift). One month window
      (s, d) => {
        val l = lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        l.join(part(s, d), col("l_partkey") === col("p_partkey"))
          .agg(
            dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
              .as("promo_revenue"),
            dsum(rev).as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            floor(col("promo_revenue") * lit(1e6) / col("total_revenue"))
              .cast("long").as("promo_ppm"))
      },
      Some("""SELECT
                CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
                  AS DOUBLE) AS promo_revenue,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
                CAST(floor(CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DOUBLE) * 1000000.0
                  / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE)) AS BIGINT) AS promo_ppm
              FROM lineitem, part
              WHERE l_partkey = p_partkey
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-02-01'""")),

    QueryDef("x102_tier_agreement",
      // cross-tier dedup consistency: do the exact tier (canonical
      // fingerprint) and the fuzzy tier (x03 MinHash+LSH at 0.5)
      // agree on what is a duplicate? One row: pair counts per tier,
      // the overlap, each tier's exclusive catch, and the agreement
      // as floored Jaccard ppm. On healthy text exact ⊆ fuzzy
      // (identical docs share signatures), so exact_only > 0 is the
      // alarm — a tier drifted. The oracle replays BOTH relations.
      //
      // BOUNDED ON BOTH SIDES: the exact tier's pair count is
      // ARITHMETIC — one fingerprint hash agg gives family sizes m,
      // n_exact = Σ m·(m−1)/2 — never a pair-enumerating self-join
      // (a million-copy boilerplate family is 5·10¹¹ pairs; the
      // fuzzy tier it audits is bucket-capped, so the audit must not
      // be the one thing that explodes). The intersection needs no
      // exact pair relation either: a fuzzy pair (a, b) is an exact
      // pair iff fp(a) = fp(b), so two (doc → family) label joins
      // against the ≤-capped fuzzy relation decide n_both. Family
      // pair counts ride DECIMAL(38,0) and saturate at Long.MaxValue
      // (the joinSizeEstimate overflow discipline)
      (s, d) => {
        val docs = documents(s, d)
        val exactFp = docs.select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("__fp"))
        // m·(m−1)/2 with no fractional decimal step: halve whichever
        // factor is even (one always is) with exact integral DIV,
        // then one DECIMAL(38,0) multiply — ≤ ~4.3e37, always fits;
        // the corpus-wide sum is ≤ n·(n−1)/2 so it fits too
        val nExact = exactFp.groupBy(col("__fp"))
          .agg(count(lit(1)).as("__m"))
          .agg(coalesce(sum(expr(
              """CASE WHEN __m % 2 = 0
                 THEN CAST(__m DIV 2 AS DECIMAL(38,0)) * (__m - 1)
                 ELSE CAST(__m AS DECIMAL(38,0)) * ((__m - 1) DIV 2)
                 END""")),
            lit(0).cast("decimal(38,0)")).as("__ne"))
          .select(least(col("__ne"), lit(Long.MaxValue)).cast("long")
            .as("n_exact"))
        val fuzzyPairs = Dedup.minHashDupPairs(docs, "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, threshold = 0.5)
        val fuzzy = fuzzyPairs
          .join(exactFp.select(col("doc_id").as("id_a"),
            col("__fp").as("__fa")), Seq("id_a"))
          .join(exactFp.select(col("doc_id").as("id_b"),
            col("__fp").as("__fb")), Seq("id_b"))
          .agg(count(lit(1)).as("n_fuzzy"),
            count(when(col("__fa") === col("__fb"), 1)).as("n_both"))
        nExact.crossJoin(fuzzy)
          .select(col("n_exact"), col("n_fuzzy"), col("n_both"),
            (col("n_exact") - col("n_both")).as("exact_only"),
            (col("n_fuzzy") - col("n_both")).as("fuzzy_only"),
            expr("""(n_both * CAST(1000000 AS BIGINT))
              DIV (n_exact + n_fuzzy - n_both)""").as("agreement_ppm"))
      },
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              ex AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text),
                        '[^a-z0-9]+', ' ', 'g'))) AS fp FROM documents) a
                JOIN (SELECT doc_id, md5(trim(regexp_replace(lower(text),
                        '[^a-z0-9]+', ' ', 'g'))) AS fp FROM documents) b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id),
              th AS (
                SELECT doc_id,
                  list_transform(toks,
                    t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
                  len(toks) AS nt
                FROM tk WHERE len(toks) > 0),
              sh AS (
                SELECT doc_id, list_distinct(CASE
                  WHEN nt >= 3 THEN list_transform(range(1, nt - 1), i ->
                    CAST('0x' || substring(md5(
                      CAST(h[CAST(i AS INT)] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 1] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 2] AS VARCHAR)), 1, 15) AS BIGINT))
                  ELSE [CAST('0x' || substring(md5(
                      CAST(h[1] AS VARCHAR) || ',' ||
                      CAST(coalesce(h[2], -1) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[3], -2) AS VARCHAR)), 1, 15) AS BIGINT)]
                  END) AS hs
                FROM th),
              mh AS (
                SELECT doc_id, i,
                  min((((1103515245 * (i + 1) + 12345) % 2147483646 + 1)
                       * (s % 2147483647)
                       + ((69069 * (i + 1) + 1234567) % 2147483647))
                      % 2147483647) AS m
                FROM (SELECT doc_id, unnest(hs) AS s FROM sh), range(0, 64) t(i)
                GROUP BY doc_id, i),
              bands AS (
                SELECT doc_id,
                  CAST(i // 4 AS VARCHAR) || ',' ||
                    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bucket
                FROM mh GROUP BY doc_id, i // 4),
              cand AS (
                SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                FROM bands l JOIN bands r
                  ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
              prs AS (
                SELECT c.id_a, c.id_b FROM cand c
                JOIN sh a ON a.doc_id = c.id_a
                JOIN sh b ON b.doc_id = c.id_b
                WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                  >= 0.5),
              j AS (
                SELECT coalesce(e.id_a, f.id_a) AS id_a,
                  e.id_a IS NOT NULL AS in_e, f.id_a IS NOT NULL AS in_f
                FROM ex e FULL OUTER JOIN prs f
                  ON e.id_a = f.id_a AND e.id_b = f.id_b)
              SELECT
                CAST(count(CASE WHEN in_e THEN 1 END) AS BIGINT) AS n_exact,
                CAST(count(CASE WHEN in_f THEN 1 END) AS BIGINT) AS n_fuzzy,
                CAST(count(CASE WHEN in_e AND in_f THEN 1 END) AS BIGINT)
                  AS n_both,
                CAST(count(CASE WHEN in_e THEN 1 END)
                  - count(CASE WHEN in_e AND in_f THEN 1 END) AS BIGINT)
                  AS exact_only,
                CAST(count(CASE WHEN in_f THEN 1 END)
                  - count(CASE WHEN in_e AND in_f THEN 1 END) AS BIGINT)
                  AS fuzzy_only,
                CAST(count(CASE WHEN in_e AND in_f THEN 1 END) AS BIGINT)
                  * 1000000
                  // (CAST(count(CASE WHEN in_e THEN 1 END) AS BIGINT)
                     + count(CASE WHEN in_f THEN 1 END)
                     - count(CASE WHEN in_e AND in_f THEN 1 END))
                  AS agreement_ppm
              FROM j""")),

    QueryDef("x103_split_leak_audit",
      // the measurement form of the leak-safe-split guarantee, run
      // against the split that provably LEAKS: near-dup pairs (x03 at
      // 0.5) whose ends straddle a plain hash split — each straddler
      // is a doc evaluated after training on its near-copy. Two label
      // joins + a 1-row aggregate; runnable against any split table
      (s, d) => {
        val docs = documents(s, d)
        Sampling.splitLeakAudit(
          Sampling.hashSplit(docs, "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
          Dedup.minHashDupPairs(docs, "doc_id", "text",
            shingleN = 3, k = 64, bands = 16, threshold = 0.5))
      },
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              th AS (
                SELECT doc_id,
                  list_transform(toks,
                    t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
                  len(toks) AS nt
                FROM tk WHERE len(toks) > 0),
              sh AS (
                SELECT doc_id, list_distinct(CASE
                  WHEN nt >= 3 THEN list_transform(range(1, nt - 1), i ->
                    CAST('0x' || substring(md5(
                      CAST(h[CAST(i AS INT)] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 1] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 2] AS VARCHAR)), 1, 15) AS BIGINT))
                  ELSE [CAST('0x' || substring(md5(
                      CAST(h[1] AS VARCHAR) || ',' ||
                      CAST(coalesce(h[2], -1) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[3], -2) AS VARCHAR)), 1, 15) AS BIGINT)]
                  END) AS hs
                FROM th),
              mh AS (
                SELECT doc_id, i,
                  min((((1103515245 * (i + 1) + 12345) % 2147483646 + 1)
                       * (s % 2147483647)
                       + ((69069 * (i + 1) + 1234567) % 2147483647))
                      % 2147483647) AS m
                FROM (SELECT doc_id, unnest(hs) AS s FROM sh), range(0, 64) t(i)
                GROUP BY doc_id, i),
              bands AS (
                SELECT doc_id,
                  CAST(i // 4 AS VARCHAR) || ',' ||
                    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bucket
                FROM mh GROUP BY doc_id, i // 4),
              cand AS (
                SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                FROM bands l JOIN bands r
                  ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
              prs AS (
                SELECT c.id_a, c.id_b FROM cand c
                JOIN sh a ON a.doc_id = c.id_a
                JOIN sh b ON b.doc_id = c.id_b
                WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                  >= 0.5),
              sp AS (
                SELECT doc_id, CASE
                  WHEN CAST('0x' || substring(
                      md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000000 < 800000 THEN 'train'
                  WHEN CAST('0x' || substring(
                      md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000000 < 900000 THEN 'val'
                  ELSE 'test' END AS split
                FROM documents)
              SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(CASE WHEN sa.split <> sb.split THEN 1 END)
                  AS BIGINT) AS straddling,
                CASE WHEN count(*) = 0 THEN 0
                  ELSE CAST(count(CASE WHEN sa.split <> sb.split THEN 1 END)
                    AS BIGINT) * 1000000 // count(*) END AS straddle_ppm
              FROM prs p
              JOIN sp sa ON sa.doc_id = p.id_a
              JOIN sp sb ON sb.doc_id = p.id_b""")),

    QueryDef("x104_mp4_brand",
      // the container flavor completes the no-codec metadata family
      // (png/gif dims, wav audio, mp4 brand): four ASCII bytes after
      // the ftyp tag, parsed back from genuine box bytes; the oracle
      // replays the brand from the id parity
      (s, d) => {
        val packed = Multimodal.packFakeMp4s(
          documents(s, d).where(col("doc_id") < 300), "doc_id")
        packed.select(col("media_id"),
            Multimodal.sniffFormat(col("media")).as("fmt"),
            Multimodal.mp4Brand(col("media")).as("brand"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, 'mp4' AS fmt,
                CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand
              FROM documents WHERE doc_id < 300 ORDER BY media_id""")),

    QueryDef("x105_pii_rate",
      // the governance dashboard: per-source PII incident rates over
      // the x33-enriched corpus (deterministic planted PII) — doc
      // incident share in floored ppm plus exact per-type hit totals;
      // map-only scoring, one per-source hash agg. The regex dialect
      // interpolates from the engine's own patterns (x33's shared-
      // dialect contract), so oracle and engine can never drift
      (s, d) => {
        val idStr = col("doc_id").cast("string")
        val enriched = concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" mail user"), idStr, lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit(" via http://host"), idStr, lit(".example/p?q=1")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".7"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" call 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")))
        val scored = documents(s, d)
          .select(col("source"), enriched.as("__t"))
          .select(col("source") +:
            TextAnalysis.piiCounts(col("__t")).map { case (n, c) =>
              c.cast("long").as(n)
            }: _*)
        scored.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("n_url") + col("n_email") + col("n_ip") +
              col("n_phone") > 0, 1)).as("docs_with_pii"),
            sum("n_url").as("url_hits"), sum("n_email").as("email_hits"),
            sum("n_ip").as("ip_hits"), sum("n_phone").as("phone_hits"))
          .select(col("source"), col("n_docs"), col("docs_with_pii"),
            expr("(docs_with_pii * CAST(1000000 AS BIGINT)) DIV n_docs")
              .as("incident_ppm"),
            col("url_hits"), col("email_hits"), col("ip_hits"),
            col("phone_hits"))
          .orderBy("source")
      },
      Some(s"""WITH e AS (
                SELECT source, text
                  || CASE WHEN doc_id % 3 = 0 THEN ' mail user'
                       || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
                  || CASE WHEN doc_id % 4 = 0 THEN ' via http://host'
                       || CAST(doc_id AS VARCHAR) || '.example/p?q=1' ELSE '' END
                  || CASE WHEN doc_id % 5 = 0 THEN ' ip 10.0.'
                       || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
                  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
                  AS t
                FROM documents),
              c AS (
                SELECT source,
                  len(regexp_extract_all(t, '${TextAnalysis.urlPattern}')) AS nu,
                  len(regexp_extract_all(t, '${TextAnalysis.emailPattern}')) AS ne,
                  len(regexp_extract_all(t, '${TextAnalysis.ipPattern}')) AS ni,
                  len(regexp_extract_all(t, '${TextAnalysis.phonePattern}')) AS np
                FROM e)
              SELECT source, count(*) AS n_docs,
                CAST(count(CASE WHEN nu + ne + ni + np > 0 THEN 1 END)
                  AS BIGINT) AS docs_with_pii,
                CAST(count(CASE WHEN nu + ne + ni + np > 0 THEN 1 END)
                  AS BIGINT) * 1000000 // count(*) AS incident_ppm,
                CAST(sum(nu) AS BIGINT) AS url_hits,
                CAST(sum(ne) AS BIGINT) AS email_hits,
                CAST(sum(ni) AS BIGINT) AS ip_hits,
                CAST(sum(np) AS BIGINT) AS phone_hits
              FROM c GROUP BY source ORDER BY source""")),

    QueryDef("x106_bpe_batched",
      // batched BPE training — the scale path to a real (32k–50k)
      // vocabulary: the state is incrementally RE-SYMBOLIZED (each
      // round's cache already carries all prior merges, so total
      // replace work is O(R), not the O(R²) of re-applying the chain)
      // and each pair-count job accepts up to `batch` NON-INTERACTING
      // merges from the top-`window` candidates (the conservative
      // order-free rule: reject on interaction with ANY higher-ranked
      // candidate — replayable as one correlated NOT EXISTS, no
      // recursion). 24 merges here land in ~7 rounds instead of 24
      // sequential jobs; the oracle re-derives every round — pair
      // counts, window, acceptance scan, and the one-pass batched
      // application via list_reduce — in chained CTEs
      (s, d) => Bpe.mergeTable(s, Bpe.trainBatched(
        Bpe.wordState(documents(s, d), "text"),
        merges = 24, batch = 4, window = 12)),
      Some(bpeBatchedOracle(rounds = 12, batch = 4, window = 12,
        merges = 24)),
      // bench-track the batched trainer beside x88's sequential loop:
      // 3x the merges in ~7 rounds — the scale path's floor belongs
      // on the sheet
      headline = true),

    QueryDef("q46_min_cost_supplier",
      // TPC-H Q2 shape (minimum-cost supplier): the correlated scalar
      // subquery ("supplycost = (SELECT min ...)") DECORRELATED as a
      // per-group min + join-back on (group, min) equality — never a
      // row_number window over everything (no global sort, no skewed
      // single-partition window; PlanAuditSpec pins the no-Window
      // shape). Dims (supplier⋈nation⋈region) filter BEFORE touching
      // the fact and broadcast under AQE; lineitem stands in for
      // partsupp as the part↔supplier offer relation. Prices ride
      // DECIMAL(18,4) so the min and its equality join-back replay
      // exactly in any engine
      (s, d) => {
        val sup = supplier(s, d)
          .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(region(s, d).where(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val offers = lineitem(s, d)
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey"), col("s_name"), col("n_name"),
            col("l_extendedprice").cast("decimal(18,4)").as("__price"))
        val minPrice = offers.groupBy(col("l_partkey"))
          .agg(min(col("__price")).as("__mp"))
        offers.join(minPrice, Seq("l_partkey"))
          .where(col("__price") === col("__mp"))
          .join(part(s, d).where(col("p_size") <= 10),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("__mp").cast("double").as("min_price"))
          .distinct()
          .orderBy(col("p_partkey"), col("s_name"))
      },
      Some("""WITH sup AS (
                SELECT s_suppkey, s_name, n_name
                FROM supplier, nation, region
                WHERE s_nationkey = n_nationkey
                  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
              off AS (
                SELECT l_partkey, s_name, n_name,
                  CAST(l_extendedprice AS DECIMAL(18,4)) AS price
                FROM lineitem JOIN sup ON l_suppkey = s_suppkey),
              mn AS (SELECT l_partkey, min(price) AS mp FROM off
                     GROUP BY 1)
              SELECT DISTINCT p_partkey, p_name, s_name, n_name,
                CAST(mp AS DOUBLE) AS min_price
              FROM off
              JOIN mn ON off.l_partkey = mn.l_partkey
                AND off.price = mn.mp
              JOIN part ON off.l_partkey = p_partkey AND p_size <= 10
              ORDER BY p_partkey, s_name""")),

    QueryDef("q47_waiting_supplier",
      // TPC-H Q21 shape (suppliers who kept orders waiting): the
      // EXISTS becomes a LEFT SEMI self-join (another supplier in the
      // same order) and the NOT EXISTS a LEFT ANTI self-join (no
      // OTHER supplier was also late) over the distinct
      // (order, supplier) relation — the canonical decorrelation, and
      // the only shapes that stream at scale (PlanAuditSpec pins
      // semi + anti in the plan). "Late" = shipped more than 60 days
      // after the order date (the schema's l_shipdate/o_orderdate
      // stand in for receipt/commit). Deterministic order:
      // (numwait DESC, s_name) with unique s_name
      (s, d) => {
        val l = lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val f = orders(s, d).where(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val allSupp = l.select(col("l_orderkey"), col("l_suppkey"))
          .distinct()
        val late = l.join(f, col("l_orderkey") === col("o_orderkey"))
          .where(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val others = allSupp.select(col("l_orderkey").as("__ok"),
          col("l_suppkey").as("__sk"))
        val lateOthers = late.select(col("l_orderkey").as("__ok2"),
          col("l_suppkey").as("__sk2"))
        late
          .join(others, col("l_orderkey") === col("__ok") &&
            col("l_suppkey") =!= col("__sk"), "left_semi")
          .join(lateOthers, col("l_orderkey") === col("__ok2") &&
            col("l_suppkey") =!= col("__sk2"), "left_anti")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name")).limit(100)
      },
      Some("""WITH f AS (SELECT o_orderkey, o_orderdate FROM orders
                         WHERE o_orderstatus = 'F'),
              als AS (SELECT DISTINCT l_orderkey, l_suppkey
                      FROM lineitem),
              late AS (SELECT DISTINCT l_orderkey, l_suppkey
                       FROM lineitem JOIN f ON l_orderkey = o_orderkey
                       WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
              w AS (SELECT * FROM late t
                    WHERE EXISTS (SELECT 1 FROM als o
                      WHERE o.l_orderkey = t.l_orderkey
                        AND o.l_suppkey <> t.l_suppkey)
                      AND NOT EXISTS (SELECT 1 FROM late x
                        WHERE x.l_orderkey = t.l_orderkey
                          AND x.l_suppkey <> t.l_suppkey))
              SELECT s_name, count(*) AS numwait
              FROM w JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""")),

    QueryDef("q48_global_sales_opportunity",
      // TPC-H Q22 shape (customers with means but no orders): the
      // scalar "above the average positive balance" gate and the NOT
      // EXISTS anti-join, both decorrelated. The average gate is
      // CROSS-MULTIPLIED — c_acctbal · n > Σ balances, all in
      // DECIMAL(18,4) — so the boundary decision is EXACT in every
      // engine (a double mean would drift with summation order
      // exactly at the rows the gate exists to decide). 1-row
      // aggregate broadcast; recent orders anti-joined (filter pushed
      // below the anti-join), never counted. Odd nations stand in for
      // Q22's phone-prefix country slice; "no order since mid-1999"
      // for "never ordered" (this corpus gives every customer some
      // order)
      (s, d) => {
        val cu = customer(s, d)
          .where(pmod(col("c_nationkey"), lit(2)) === 1)
        val a = cu.where(col("c_acctbal") > 0)
          .agg(sum(col("c_acctbal").cast("decimal(18,4)")).as("__s"),
            count(lit(1)).as("__n"))
        cu.crossJoin(broadcast(a))
          .where(col("c_acctbal").cast("decimal(18,4)") * col("__n") >
            col("__s"))
          .join(orders(s, d)
              .where(col("o_orderdate") >=
                lit("1999-06-01").cast("timestamp"))
              .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            dsum(col("c_acctbal")).as("totacctbal"))
          .select(col("c_nationkey").as("cntry"), col("numcust"),
            col("totacctbal"))
          .orderBy("cntry")
      },
      Some("""WITH cu AS (SELECT * FROM customer
                          WHERE c_nationkey % 2 = 1),
              a AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
                      count(*) AS n
                    FROM cu WHERE c_acctbal > 0),
              g AS (SELECT cu.* FROM cu, a
                    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s),
              w AS (SELECT * FROM g WHERE NOT EXISTS
                      (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '1999-06-01'))
              SELECT c_nationkey AS cntry, count(*) AS numcust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                  AS totacctbal
              FROM w GROUP BY 1 ORDER BY cntry""")),

    QueryDef("q49_priority_check",
      // TPC-H Q4 shape (order priority checking): the correlated
      // EXISTS ("some lineitem missed its commitment") as a LEFT SEMI
      // join with the correlated date predicate IN the join condition
      // — each order counts once no matter how many lineitems were
      // late, with no distinct and no window. One quarter of orders;
      // "late" = shipped >30 days after the order date (this schema's
      // stand-in for receipt > commit)
      (s, d) => orders(s, d)
        .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
              FROM orders o
              WHERE o_orderdate >= TIMESTAMP '1996-07-01'
                AND o_orderdate < TIMESTAMP '1996-10-01'
                AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
              GROUP BY 1 ORDER BY 1""")),

    QueryDef("q50_supplier_relationship",
      // TPC-H Q16 shape (parts/supplier relationship): the NOT IN
      // complaint-supplier exclusion as a LEFT ANTI join against the
      // (small, broadcast) excluded set, over the DISTINCT
      // (part, supplier) offer relation; count distinct suppliers per
      // (brand, type, size) bucket. Negative account balance stands
      // in for the complaint comment scan
      (s, d) => lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(supplier(s, d).where(col("s_acctbal") < 0)
            .select(col("s_suppkey").as("l_suppkey")),
          Seq("l_suppkey"), "left_anti")
        .join(part(s, d).where(col("p_type") =!= "STANDARD" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size")),
      Some("""SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
              JOIN part ON l_partkey = p_partkey
              WHERE p_type <> 'STANDARD'
                AND p_size IN (1, 4, 9, 16, 25, 36, 49)
                AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                      WHERE s_acctbal < 0)
              GROUP BY 1, 2, 3
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    QueryDef("q51_small_quantity_revenue",
      // TPC-H Q17 shape (small-quantity-order revenue): the correlated
      // scalar gate "l_quantity < 0.2 * (SELECT avg(l_quantity) WHERE
      // l_partkey = p_partkey)" DECORRELATED as a per-part (sum, n)
      // aggregate + join-back, with the fraction CROSS-MULTIPLIED —
      // qty · 5 · n < Σqty, all in DECIMAL — so the boundary rows a
      // double 0.2·avg would drift on decide EXACTLY the same in any
      // engine. The brand filter semi-restricts lineitem BEFORE the
      // per-part aggregate (the inner avg is per-part, so restricting
      // parts first is equivalence-preserving and prunes the fact
      // scan); part is a broadcast dim. One-row answer, no window
      (s, d) => {
        val li = lineitem(s, d)
          .join(part(s, d)
              .where(col("p_brand").isin("Brand#21", "Brand#22"))
              .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"),
            col("l_quantity").cast("decimal(18,4)").as("__q"),
            col("l_extendedprice"))
        val st = li.groupBy(col("l_partkey"))
          .agg(sum(col("__q")).as("__sq"), count(lit(1)).as("__n"))
        li.join(st, Seq("l_partkey"))
          .where(col("__q") * 5 * col("__n") < col("__sq"))
          .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      },
      Some("""WITH li AS (
                SELECT l_partkey,
                  CAST(l_quantity AS DECIMAL(18,4)) AS q,
                  l_extendedprice
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                  WHERE p_brand IN ('Brand#21', 'Brand#22')))
              SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                       AS DOUBLE) / 7.0 AS avg_yearly
              FROM li o
              WHERE q * 5 * (SELECT count(*) FROM li i
                             WHERE i.l_partkey = o.l_partkey)
                < (SELECT sum(q) FROM li i
                   WHERE i.l_partkey = o.l_partkey)""")),

    QueryDef("q52_part_promotion_supplier",
      // TPC-H Q20 shape (potential part promotion): the nested
      // IN-chain — suppliers IN (offers of parts IN (name-filtered
      // parts) whose one-year quantity exceeds half the availability)
      // — decorrelated to a semi-join ladder: name-filtered parts
      // semi-restrict lineitem, a per-(part, supplier) aggregate
      // forms BOTH sides of the half gate in one pass (conditional
      // sum), the gate CROSS-MULTIPLIES in DECIMAL (2·q1996 > qtotal
      // — exact at ties±ε where a double 0.5· would flap), and the
      // surviving supplier set semi-joins into the supplier dim.
      // lineitem's shipped quantity stands in for partsupp
      // availability (no partsupp table in this corpus). No distinct
      // needed above the semi joins; nation dim broadcasts
      (s, d) => {
        val li = lineitem(s, d)
          .join(part(s, d).where(col("p_name").like("small%"))
              .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("decimal(18,4)").as("__q"),
            year(col("l_shipdate")).as("__y"))
        val qualified = li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(when(col("__y") === 1996, col("__q"))
              .otherwise(lit(0).cast("decimal(18,4)"))).as("__q96"),
            sum(col("__q")).as("__qt"))
          .where(col("__q96") * 2 > col("__qt"))
          .select(col("l_suppkey")).distinct()
        supplier(s, d)
          .join(qualified, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .join(nation(s, d)
              .where(col("n_name").isin("NATION_3", "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name"))
          .orderBy(col("s_name"))
      },
      Some("""SELECT s_name, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name IN ('NATION_3', 'NATION_7')
                AND s_suppkey IN (
                  SELECT l_suppkey FROM lineitem
                  WHERE l_partkey IN (SELECT p_partkey FROM part
                    WHERE p_name LIKE 'small%')
                  GROUP BY l_partkey, l_suppkey
                  HAVING sum(CASE WHEN EXTRACT(year FROM l_shipdate)
                        = 1996
                      THEN CAST(l_quantity AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) * 2
                    > sum(CAST(l_quantity AS DECIMAL(18,4))))
              ORDER BY s_name""")),

    QueryDef("q53_volume_shipping",
      // TPC-H Q7 shape (volume shipping): the nation-PAIR query —
      // two dimension copies with role names, the pair predicate
      // either direction, conditional per-year aggregation. Pushdown
      // discipline: both nation copies filter to the two nations
      // BEFORE joining (the joins then shrink supplier/customer to
      // 2/25ths), the pair predicate above only removes same-nation
      // pairs; all dims broadcast, the two facts join on their keys
      (s, d) => {
        val pair = Seq("NATION_1", "NATION_2")
        val suppN = nation(s, d).where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("__snk"),
            col("n_name").as("supp_nation"))
        val custN = nation(s, d).where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("__cnk"),
            col("n_name").as("cust_nation"))
        lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(suppN, col("s_nationkey") === col("__snk"))
          .join(custN, col("c_nationkey") === col("__cnk"))
          .where(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                EXTRACT(year FROM l_shipdate) AS l_year,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem, orders, customer, supplier,
                nation n1, nation n2
              WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND l_suppkey = s_suppkey
                AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND n1.n_name IN ('NATION_1', 'NATION_2')
                AND n2.n_name IN ('NATION_1', 'NATION_2')
                AND n1.n_name <> n2.n_name
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    QueryDef("q54_product_type_profit",
      // TPC-H Q9 shape (product-type profit): the fact-fact-FACT
      // chain lineitem⋈orders⋈part⋈supplier⋈nation with profit =
      // revenue − cost per line, grouped by (nation, order-year).
      // p_retailprice·l_quantity stands in for the missing partsupp
      // supplycost (no partsupp table in this corpus — same stand-in
      // rule as q52). Amount formed ONCE per line in DECIMAL before
      // the aggregate; name-filtered part is the selective dim and
      // prunes lineitem through the join; dims broadcast
      (s, d) => lineitem(s, d)
        .join(part(s, d).where(col("p_name").like("%gear"))
            .select(col("p_partkey"), col("p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * lit(0.1))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc),
      Some("""SELECT n_name AS nation,
                EXTRACT(year FROM o_orderdate) AS o_year,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    - p_retailprice * l_quantity * 0.1
                  AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
              FROM lineitem, part, orders, supplier, nation
              WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
                AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                AND p_name LIKE '%gear'
              GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    QueryDef("q55_important_part_value",
      // TPC-H Q11 shape (important stock): a per-part aggregate gated
      // by a GLOBAL scalar computed over a DIFFERENT grouping of the
      // same restriction — the decorrelated form is one grouped
      // aggregate plus a 1-row broadcast joined back. Gate is
      // "above-average part value" cross-multiplied in DECIMAL
      // (value·n_parts > total — exact where value > total/n flaps in
      // doubles), the q51/q52 overflow discipline. Value =
      // Σ price·qty over NATION_5's suppliers' lines (the partsupp
      // stand-in); the nation restriction is a broadcast semi-join
      (s, d) => {
        val natSupp = supplier(s, d)
          .join(nation(s, d).where(col("n_name") === "NATION_5"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val value = lineitem(s, d)
          .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum((col("l_extendedprice") * col("l_quantity"))
            .cast("decimal(18,4)")).as("__v"))
        val tot = value.agg(sum(col("__v")).as("__tot"),
          count(lit(1)).as("__n"))
        value.crossJoin(broadcast(tot))
          .where(col("__v") * col("__n") > col("__tot"))
          .select(col("l_partkey").as("p_partkey"),
            col("__v").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("p_partkey"))
          .limit(50)
      },
      Some("""WITH v AS (
                SELECT l_partkey,
                  sum(CAST(l_extendedprice * l_quantity
                    AS DECIMAL(18,4))) AS v
                FROM lineitem
                WHERE l_suppkey IN (
                  SELECT s_suppkey FROM supplier, nation
                  WHERE s_nationkey = n_nationkey
                    AND n_name = 'NATION_5')
                GROUP BY 1),
              t AS (SELECT sum(v) AS tot, count(*) AS n FROM v)
              SELECT l_partkey AS p_partkey,
                CAST(v AS DOUBLE) AS part_value
              FROM v, t WHERE v * n > tot
              ORDER BY part_value DESC, p_partkey LIMIT 50""")),

    QueryDef("q56_customer_distribution",
      // TPC-H Q13 shape (customer order distribution): the LEFT OUTER
      // aggregation — every customer counts, order-less ones as zero,
      // with the order filter INSIDE the join (a WHERE above the
      // outer join would silently turn it inner: the classic Q13
      // trap). Two hash aggs; the second is over a count-sized domain
      (s, d) => customer(s, d).select(col("c_custkey"))
        .join(orders(s, d)
            .where(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist
              FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                    FROM customer LEFT OUTER JOIN orders
                      ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
                    GROUP BY c_custkey)
              GROUP BY c_count
              ORDER BY custdist DESC, c_count DESC""")),

    QueryDef("q57_top_supplier",
      // TPC-H Q15 shape (top supplier): the max-revenue join-back —
      // the revenue "view" aggregates once, its 1-row max broadcasts
      // back onto itself (no window, no second scan of the fact), and
      // only then does the supplier dim join. Revenue stays DECIMAL
      // through the max-equality (exact — order-independent sums are
      // why dsum exists) and casts to double only for output
      (s, d) => {
        val rev = lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("__rev"))
        val top = rev.agg(max(col("__rev")).as("__max"))
        supplier(s, d)
          .join(rev.crossJoin(broadcast(top))
              .where(col("__rev") === col("__max")),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("__rev").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
                SELECT l_suppkey,
                  sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) AS r
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY 1)
              SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
              FROM supplier JOIN rev ON s_suppkey = l_suppkey
              WHERE r = (SELECT max(r) FROM rev)
              ORDER BY s_suppkey""")),

    QueryDef("q58_disjunctive_revenue",
      // TPC-H Q19 shape (discounted revenue): the OR-of-ANDs whose
      // conjuncts each MIX columns of both tables — un-pushable as
      // written, so the per-side hulls are pushed EXPLICITLY: part
      // pre-filters to the brand/size union, lineitem to the quantity
      // union (each implied by the disjunction), and the exact OR
      // applies above the join. At 100 TB the hull filters are what
      // keep the join from reading both tables whole; the brands are
      // this corpus's Brand#1/2/3
      (s, d) => {
        val b1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
        val b2 = col("p_brand") === "Brand#2" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
        val b3 = col("p_brand") === "Brand#3" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
        lineitem(s, d)
          .where(col("l_quantity").between(1, 30)) // quantity hull
          .join(part(s, d)
              .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
                col("p_size").between(1, 15)), // brand/size hull
            col("l_partkey") === col("p_partkey"))
          .where(b1 || b2 || b3)
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                     AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                     AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 20 AND 30)""")),

    QueryDef("q59_market_share",
      // TPC-H Q8 shape (national market share): the share-of-
      // aggregate query — one revenue stream split two ways inside a
      // single grouped aggregate (conditional numerator / full
      // denominator), then the ratio. Exactness discipline: the
      // DECIMAL(18,4) sums convert to BIGINT ten-thousandths and the
      // ppm ratio is integer cross-multiplication in DECIMAL(38,0) —
      // no double division anywhere, so the share replays bit-for-bit.
      // Customer side restricted by region (pushed), share measured
      // for the supplier nation
      (s, d) => {
        val custAmerica = customer(s, d)
          .join(nation(s, d).select(col("n_nationkey").as("__cnk"),
            col("n_regionkey")), col("c_nationkey") === col("__cnk"))
          .join(region(s, d).where(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
        lineitem(s, d)
          .join(orders(s, d)
              .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(custAmerica, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(nation(s, d).select(col("n_nationkey").as("__snk"),
            col("n_name")), col("s_nationkey") === col("__snk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("n_name") === "NATION_5",
                (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                  .cast("decimal(18,4)"))
              .otherwise(lit(0).cast("decimal(18,4)"))).as("__num"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,4)")).as("__den"))
          .select(col("o_year"),
            expr("""CAST((CAST(__num * 10000 AS DECIMAL(38,0))
              * 1000000) DIV CAST(__den * 10000 AS DECIMAL(38,0))
              AS BIGINT)""").as("mkt_share_ppm"),
            col("__den").cast("double").as("total_volume"))
          .orderBy("o_year")
      },
      Some("""WITH v AS (
                SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                  CAST(sum(CASE WHEN n_name = 'NATION_5'
                    THEN CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT)
                    AS num4,
                  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) * 10000 AS BIGINT) AS den4,
                  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) AS total_volume
                FROM lineitem, orders, supplier, nation
                WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
                  AND s_nationkey = n_nationkey
                  AND o_custkey IN (
                    SELECT c_custkey FROM customer, nation n2, region
                    WHERE c_nationkey = n2.n_nationkey
                      AND n2.n_regionkey = r_regionkey
                      AND r_name = 'AMERICA')
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
                GROUP BY 1)
              SELECT o_year,
                CAST(CAST(num4 AS HUGEINT) * 1000000 // den4 AS BIGINT)
                  AS mkt_share_ppm,
                total_volume
              FROM v ORDER BY o_year""")),

    QueryDef("q60_priority_counting",
      // TPC-H Q12 shape (shipmode priority counting): the two-way
      // conditional COUNT inside one grouped aggregate — urgent
      // orders vs the rest per class, with the date window pushed
      // into the fact scan. l_returnflag stands in for the schema's
      // missing l_shipmode (same stand-in rule as q52's partsupp)
      (s, d) => lineitem(s, d)
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY 1 ORDER BY 1""")),

    QueryDef("q61_forecast_revenue",
      // TPC-H Q6 shape (forecasting revenue change): the pure
      // filter-scan aggregate — every predicate pushes into the
      // parquet scan (year window, discount band, quantity cap), one
      // DECIMAL-exact 1-row sum, no join, no shuffle beyond the final
      // partial/final agg pair. The baseline shape every scan-layer
      // regression shows up in first
      (s, d) => lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
                AND l_discount BETWEEN 0.05 AND 0.07
                AND l_quantity < 24""")),

    QueryDef("x107_temperature_mix",
      // temperature-smoothed source mixture (the multilingual-
      // sampling rule, alpha = 1/2): natural rates oversample the
      // biggest source; smoothed rates ∝ sqrt(tokens) lift the tail
      // (XLM-style). floor(sqrt) of an exact Long token count is the
      // ONE alpha both engines compute bit-identically (IEEE sqrt is
      // correctly rounded; a general pow would drift) — so the rates
      // replay exactly in floored ppm. One token scan → source-sized
      // state → 1-row total broadcast
      (s, d) => {
        val bySource = documents(s, d)
          .select(col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("__t"))
          .groupBy("source").agg(sum("__t").as("tokens"))
          .select(col("source"), col("tokens"),
            floor(sqrt(col("tokens").cast("double"))).cast("long").as("__w"))
        val tot = bySource.agg(sum("__w").as("__tw"),
          sum("tokens").as("__tt"))
        bySource.crossJoin(broadcast(tot))
          .select(col("source"), col("tokens"),
            // DECIMAL(38,0) numerators (ADVICE r9): tokens*1e6 wraps
            // BIGINT silently once a source passes ~9.2e12 tokens —
            // real corpora do. Same widening as SkewJoin.heavyKeys
            expr("""CAST((CAST(tokens AS DECIMAL(38,0)) * 1000000)
              DIV __tt AS BIGINT)""").as("natural_ppm"),
            expr("""CAST((CAST(__w AS DECIMAL(38,0)) * 1000000)
              DIV __tw AS BIGINT)""").as("smoothed_ppm"))
          .orderBy("source")
      },
      Some("""WITH t AS (
                SELECT source, CAST(sum(len(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                    ' '), x -> x <> ''))) AS BIGINT) AS tokens
                FROM documents GROUP BY 1),
              w AS (SELECT source, tokens,
                      CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT)
                        AS w
                    FROM t),
              tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
                        CAST(sum(tokens) AS BIGINT) AS tt FROM w)
              SELECT source, tokens,
                CAST(CAST(tokens AS HUGEINT) * 1000000 // tt AS BIGINT)
                  AS natural_ppm,
                CAST(CAST(w AS HUGEINT) * 1000000 // tw AS BIGINT)
                  AS smoothed_ppm
              FROM w, tot ORDER BY source""")),

    QueryDef("x108_count_min",
      // portable count-min sketch: memory-bounded heavy-hitter
      // counting — the sketch is depth×width Longs no matter how many
      // distinct terms exist, errs only UPWARD, and merges cell-wise
      // (grown == one-shot exactly, like every other state here).
      // Hashing rides the engine's md5-60 primitive, so the oracle
      // re-derives every cell and every min-estimate; output compares
      // the top-20 exact counts against their sketch estimates
      (s, d) => {
        import graft.operators.CountMin
        val words = documents(s, d).select(
          explode(TextAnalysis.tokens(col("text"))).as("word"))
        val sketch = CountMin.build(words, col("word"))
        val exact = words.groupBy("word").agg(count(lit(1)).as("exact_c"))
          .orderBy(col("exact_c").desc, col("word")).limit(20)
        CountMin.estimate(sketch, exact, col("word"))
          .join(exact, col("term") === col("word"))
          .select(col("word"), col("exact_c"), col("cms_est"),
            expr("""((cms_est - exact_c) * CAST(1000000 AS BIGINT))
              DIV exact_c""").as("over_ppm"))
          .orderBy(col("exact_c").desc, col("word"))
      },
      Some("""WITH tk AS (
                SELECT list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                  ' '), x -> x <> '') AS toks
                FROM documents),
              un AS (SELECT unnest(toks) AS word FROM tk),
              sk AS (
                SELECT r, CAST(CAST('0x' || substring(md5(
                    'cms:' || CAST(r AS VARCHAR) || ':' || word), 1, 15)
                    AS BIGINT) % 1024 AS BIGINT) AS bucket,
                  CAST(count(*) AS BIGINT) AS c
                FROM un, range(0, 4) t(r)
                GROUP BY 1, 2),
              ex AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_c
                     FROM un GROUP BY 1
                     ORDER BY exact_c DESC, word LIMIT 20),
              q AS (SELECT e.word, e.exact_c, t.r,
                      CAST(CAST('0x' || substring(md5(
                        'cms:' || CAST(t.r AS VARCHAR) || ':' || e.word),
                        1, 15) AS BIGINT) % 1024 AS BIGINT) AS bucket
                    FROM ex e, range(0, 4) t(r)),
              est AS (SELECT q.word, min(coalesce(s.c, 0)) AS cms_est
                      FROM q LEFT JOIN sk s
                        ON s.r = q.r AND s.bucket = q.bucket
                      GROUP BY 1)
              SELECT e.word AS word, e.exact_c, est.cms_est,
                (est.cms_est - e.exact_c) * 1000000 // e.exact_c
                  AS over_ppm
              FROM ex e JOIN est ON e.word = est.word
              ORDER BY e.exact_c DESC, e.word""")),

    QueryDef("x109_png_pixels",
      // REAL PNG pixel decode (r9 verdict item 6): deterministic
      // COMPLETE PNGs (genuine zlib IDAT, CRCs, per-row filters
      // cycling through all five predictors) are synthesized from the
      // doc ids, decoded back through Inflater + unfilter, and exact
      // integer pixel stats computed. The oracle never decodes: every
      // pixel is (id·31 + x·7 + y·13) mod 256 by construction, so
      // DuckDB replays the stats as plain integer algebra over a
      // lateral range — any decode defect (wrong filter math, zlib
      // mis-assembly, dim mix-up) breaks the sums bit-for-bit
      (s, d) => Multimodal.pngPixelStats(s,
          Multimodal.packRealPngs(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, doc_id % 16 + 4 AS w,
                  (doc_id * 7) % 12 + 4 AS h
                FROM documents WHERE doc_id < 500),
              px AS (
                SELECT id, w, h,
                  (id * 31 + x.x * 7 + y.y * 13) % 256 AS v
                FROM imgs, range(0, 20) x(x), range(0, 16) y(y)
                WHERE x.x < w AND y.y < h)
              SELECT id AS media_id, w AS width, h AS height,
                count(*) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM px GROUP BY 1, 2, 3 ORDER BY media_id""")),

    QueryDef("x110_ann_autotune",
      // ANN nprobe auto-tuning (r9 verdict item 7): the probe-
      // coverage curve — for each candidate nprobe, the share of
      // corpus mass the queries' nearest cells hold (floored integer
      // ppm) — plus the target gate a caller's recall floor reads.
      // Mass coverage is the CONSERVATIVE recall proxy (x62 measured
      // 0.31 recall at 0.125 mass), so "smallest nprobe with
      // covered_ppm >= target" is the derived operating point,
      // replacing the silently-default nprobe=2. Queries = the corpus
      // itself (the self-audit form); one assign pass + one ranked-
      // cells pass + an nlist-row cumulative window
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        IvfAnn.probeCoverage(emb, "embedding", emb, "embedding", cents)
          .withColumn("meets_target", col("covered_ppm") >= 600000L)
          .orderBy("nprobe")
      },
      // the x61 assignment replay (seed centroids, exact integer
      // argmin, ties to the lower cell) extended to the FULL ranking
      // per query, then cumulative mass over rank
      Some(s"""WITH q AS (
                SELECT vec_id, embedding,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                FROM embeddings),
              cent AS (
                SELECT vec_id % 16 AS cell, d,
                  CAST(floor(CAST(sum(qv[CAST(d AS INT)]) AS DOUBLE)
                             / count(*) + 0.5) AS BIGINT) AS c
                FROM q, range(1, 65) t(d)
                GROUP BY 1, 2),
              dist AS (
                SELECT q.vec_id, ct.cell,
                  CAST(sum((q.qv[CAST(ct.d AS INT)] - ct.c)
                         * (q.qv[CAST(ct.d AS INT)] - ct.c)) AS BIGINT) AS d2
                FROM q, cent ct
                GROUP BY q.vec_id, ct.cell),
              ranked AS (
                SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, cell) AS rk FROM dist),
              counts AS (
                SELECT cell, count(*) AS n FROM ranked
                WHERE rk = 1 GROUP BY 1),
              perpos AS (
                SELECT rk, CAST(sum(coalesce(n, 0)) AS BIGINT) AS s
                FROM ranked LEFT JOIN counts USING (cell)
                GROUP BY rk),
              tot AS (SELECT count(*) AS nq FROM embeddings)
              SELECT CAST(rk AS INT) AS nprobe,
                CAST(CAST(sum(s) OVER (ORDER BY rk) AS HUGEINT) * 1000000
                  // (SELECT nq * nq FROM tot) AS BIGINT) AS covered_ppm,
                CAST(CAST(sum(s) OVER (ORDER BY rk) AS HUGEINT) * 1000000
                  // (SELECT nq * nq FROM tot) >= 600000 AS BOOLEAN)
                  AS meets_target
              FROM perpos ORDER BY nprobe""")),

    QueryDef("x112_bloom_membership",
      // portable Bloom filter — the dedup stack's NEGATIVE CACHE: a
      // membership screen with NO false negatives, so "definitely
      // new" batch digests skip the exact-index probe I/O entirely.
      // The filter is the set-bits RELATION (distinct ints, mergeable
      // by union — grown == one-shot), hashed with md5-60 so the
      // oracle re-derives every bit. Probe set = 50 digests that ARE
      // in the corpus (must all read true — the no-false-negative
      // guarantee, visible in the output) + 50 synthetic absentees
      // (read false except measured-rate FPs, deterministic)
      (s, d) => {
        import graft.operators.Bloom
        val sess = s
        import sess.implicits._
        val digests = documents(s, d).select(md5(col("text")).as("digest"))
        val filter = Bloom.build(digests, col("digest"),
          k = 7, bits = 1L << 20)
        val present = documents(s, d).where(col("doc_id") < 50)
          .select(md5(col("text")).as("probe"))
        val absent = (0 until 50).map(i => s"absent:$i").toDF("probe")
        Bloom.probe(filter, present.unionByName(absent), col("probe"),
            k = 7, bits = 1L << 20)
          .orderBy("term")
      },
      Some("""WITH dg AS (SELECT md5(text) AS digest FROM documents),
              bits AS (
                SELECT DISTINCT CAST(CAST('0x' || substring(md5(
                    'bloom:' || CAST(i AS VARCHAR) || ':' || digest),
                    1, 15) AS BIGINT) % 1048576 AS BIGINT) AS bit
                FROM dg, range(0, 7) t(i)),
              probes AS (
                SELECT DISTINCT md5(text) AS probe FROM documents
                WHERE doc_id < 50
                UNION
                SELECT 'absent:' || CAST(r AS VARCHAR) FROM range(0, 50) s(r)),
              fan AS (
                SELECT probe, CAST(CAST('0x' || substring(md5(
                    'bloom:' || CAST(i AS VARCHAR) || ':' || probe),
                    1, 15) AS BIGINT) % 1048576 AS BIGINT) AS bit
                FROM probes, range(0, 7) t(i))
              SELECT probe AS term,
                count(b.bit) = 7 AS maybe_present
              FROM fan LEFT JOIN bits b USING (bit)
              GROUP BY probe ORDER BY term""")),

    QueryDef("x113_bloom_fp_audit",
      // the Bloom tier's measured-loss audit (the x62/x63 house
      // discipline): realized false-positive rate over a large
      // known-absent probe set, beside the filter's fill ratio — the
      // two numbers the sizing rule (FP ≈ fill^k) is checked against.
      // Exact integers; the oracle replays filter, probes, and ppm
      (s, d) => {
        import graft.operators.Bloom
        val sess = s
        import sess.implicits._
        val digests = documents(s, d).select(md5(col("text")).as("digest"))
        val filter = Bloom.build(digests, col("digest"),
          k = 7, bits = 1L << 20)
        val absent = (0 until 2000).map(i => s"never-seen:$i").toDF("probe")
        Bloom.fpAudit(filter, absent, col("probe"), k = 7, bits = 1L << 20)
      },
      Some("""WITH dg AS (SELECT md5(text) AS digest FROM documents),
              bits AS (
                SELECT DISTINCT CAST(CAST('0x' || substring(md5(
                    'bloom:' || CAST(i AS VARCHAR) || ':' || digest),
                    1, 15) AS BIGINT) % 1048576 AS BIGINT) AS bit
                FROM dg, range(0, 7) t(i)),
              fan AS (
                SELECT 'never-seen:' || CAST(r AS VARCHAR) AS probe,
                  CAST(CAST('0x' || substring(md5(
                    'bloom:' || CAST(i AS VARCHAR) || ':' ||
                    'never-seen:' || CAST(r AS VARCHAR)),
                    1, 15) AS BIGINT) % 1048576 AS BIGINT) AS bit
                FROM range(0, 2000) s(r), range(0, 7) t(i)),
              flags AS (
                SELECT probe, count(b.bit) = 7 AS flagged
                FROM fan LEFT JOIN bits b USING (bit)
                GROUP BY probe),
              agg AS (
                SELECT CAST(count(*) AS BIGINT) AS n_absent,
                  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged
                FROM flags),
              nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set
                     FROM bits)
              SELECT n_bits_set,
                n_bits_set * 1000000 // 1048576 AS fill_ppm,
                n_absent, n_flagged,
                CASE WHEN n_absent = 0 THEN NULL
                  ELSE n_flagged * 1000000 // n_absent END AS fp_ppm
              FROM agg, nb""")),

    QueryDef("x114_kmv_distinct",
      // KMV bottom-k sketch, the distinct-count half: the k smallest
      // md5-60 hashes of the key space (lineitem part keys — 200/2k/20k
      // distinct across the SFs, so the oracle gates BOTH the sub-k
      // exact path and the (k-1)M/h_k estimator path) ARE the sketch (a relation,
      // mergeable by union+re-bottom-k — grown == one-shot), and the
      // estimator is pure floored integer math, so the oracle
      // re-derives sketch, estimate, and the measured-error audit
      // (the house discipline: every lossy tier ships its loss)
      (s, d) => {
        val keys = lineitem(s, d)
          .select(col("l_partkey").cast("string").as("pk"))
        val sketch = Kmv.build(keys, col("pk"), k = 256)
        val exact = keys.select(Kmv.hash(col("pk"), "kmv").as("hv"))
          .agg(count_distinct(col("hv")).as("exact_distinct"))
        Kmv.distinctEstimate(sketch, k = 256)
          .crossJoin(broadcast(exact))
          .select(col("n_held"), col("h_k"), col("kmv_est"),
            col("exact_distinct"),
            expr("""(abs(kmv_est - exact_distinct) * CAST(1000000 AS BIGINT))
              DIV exact_distinct""").as("abs_err_ppm"))
      },
      Some(s"""WITH hv AS (
                SELECT DISTINCT CAST('0x' || substring(md5(
                  'kmv:' || CAST(l_partkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
                FROM lineitem),
              sk AS (SELECT hv FROM hv ORDER BY hv LIMIT 256),
              est AS (
                SELECT CAST(count(*) AS BIGINT) AS n_held,
                  CAST(max(hv) AS BIGINT) AS h_k,
                  CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
                    ELSE CAST(CAST(255 AS HUGEINT) *
                      CAST(${Kmv.M}
                        AS HUGEINT) // CAST(max(hv) AS HUGEINT) AS BIGINT)
                  END AS kmv_est
                FROM sk),
              ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct
                     FROM hv)
              SELECT n_held, h_k, kmv_est, exact_distinct,
                abs(kmv_est - exact_distinct) * 1000000 // exact_distinct
                  AS abs_err_ppm
              FROM est, ex""")),

    QueryDef("x115_kmv_setops",
      // KMV's set-operation half — the capability HLL lacks and a
      // cross-source curator needs: union size, Jaccard, and
      // intersection size between two corpora (two overlapping
      // part-key bands — true Jaccard ≈ 0.2 at every SF, so the
      // estimate sits at neither degenerate pole) from two k-row
      // sketches, no corpus
      // join. The bottom-k of the sketches' union is a uniform sample
      // of A∪B's hash space; members present in BOTH sketches
      // estimate the overlap. Beside each estimate: the exact value
      // and measured error, all floored integer math the oracle
      // replays bit-for-bit
      (s, d) => {
        def side(lo: Int, hi: Int) = lineitem(s, d)
          .where(pmod(col("l_partkey"), lit(10)) >= lo &&
            pmod(col("l_partkey"), lit(10)) < hi)
          .select(col("l_partkey").cast("string").as("pk"))
        val est = Kmv.setOps(
          Kmv.build(side(0, 6), col("pk"), k = 256),
          Kmv.build(side(4, 10), col("pk"), k = 256), k = 256)
        val a = side(0, 6).select(Kmv.hash(col("pk"), "kmv").as("hv")).distinct()
        val b = side(4, 10).select(Kmv.hash(col("pk"), "kmv").as("hv")).distinct()
        val exact = a.unionByName(b).distinct()
          .agg(count(lit(1)).as("exact_union"))
          .crossJoin(a.join(b, Seq("hv"), "left_semi")
            .agg(count(lit(1)).as("exact_intersect")))
        est.crossJoin(broadcast(exact))
          .select(col("n_held"), col("union_est"), col("k_both"),
            col("jaccard_ppm"), col("intersect_est"),
            col("exact_union"), col("exact_intersect"),
            expr("""(exact_intersect * CAST(1000000 AS BIGINT))
              DIV exact_union""").as("exact_jaccard_ppm"))
      },
      Some(s"""WITH ha AS (SELECT DISTINCT CAST('0x' || substring(md5(
                  'kmv:' || CAST(l_partkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
                FROM lineitem WHERE l_partkey % 10 >= 0
                  AND l_partkey % 10 < 6),
              hb AS (SELECT DISTINCT CAST('0x' || substring(md5(
                  'kmv:' || CAST(l_partkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
                FROM lineitem WHERE l_partkey % 10 >= 4
                  AND l_partkey % 10 < 10),
              ska AS (SELECT hv FROM ha ORDER BY hv LIMIT 256),
              skb AS (SELECT hv FROM hb ORDER BY hv LIMIT 256),
              sku AS (SELECT hv FROM (
                  SELECT DISTINCT hv FROM (
                    SELECT hv FROM ska UNION ALL SELECT hv FROM skb))
                ORDER BY hv LIMIT 256),
              flg AS (SELECT u.hv,
                  CASE WHEN u.hv IN (SELECT hv FROM ska)
                    AND u.hv IN (SELECT hv FROM skb)
                  THEN 1 ELSE 0 END AS in_both
                FROM sku u),
              est AS (
                SELECT CAST(count(*) AS BIGINT) AS n_held,
                  CAST(sum(in_both) AS BIGINT) AS k_both,
                  CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
                    ELSE CAST(CAST(255 AS HUGEINT) *
                      CAST(${Kmv.M}
                        AS HUGEINT) // CAST(max(hv) AS HUGEINT) AS BIGINT)
                  END AS union_est
                FROM flg),
              ex AS (
                SELECT (SELECT CAST(count(*) AS BIGINT) FROM
                    (SELECT hv FROM ha UNION SELECT hv FROM hb))
                  AS exact_union,
                  (SELECT CAST(count(*) AS BIGINT) FROM ha
                   WHERE hv IN (SELECT hv FROM hb)) AS exact_intersect)
              SELECT n_held, union_est, k_both,
                CASE WHEN n_held = 0 THEN NULL
                  ELSE k_both * 1000000 // n_held END AS jaccard_ppm,
                CASE WHEN n_held = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(CAST(k_both AS HUGEINT) *
                    CAST(union_est AS HUGEINT) //
                    CAST(n_held AS HUGEINT) AS BIGINT)
                END AS intersect_est,
                exact_union, exact_intersect,
                exact_intersect * 1000000 // exact_union
                  AS exact_jaccard_ppm
              FROM est, ex""")),

    QueryDef("x116_overlap_matrix",
      // the grouped-KMV OVERLAP MATRIX — the cross-source planning
      // question at corpus scale ("how much does each slice overlap
      // each other") from ONE scan: per-group bottom-k sketches via
      // the native BottomKLongs aggregate (partial map-side, ≤ k
      // Longs per group·task in the shuffle — NO per-group sort),
      // then all pairwise union/Jaccard/intersection estimates from
      // the model-sized sketch relation. Subject: the part spaces of
      // 1995's ship months (66 pairs; ~50/600/6k parts per month
      // across the SFs, so sub-k exact AND estimator paths both gate)
      (s, d) => {
        val li = lineitem(s, d)
          .where(year(col("l_shipdate")) === 1995)
          .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"),
            col("l_partkey").cast("string").as("pk"))
        Kmv.pairwiseOverlap(
            Kmv.groupedBuild(li, col("m"), col("pk"), k = 64), k = 64)
          .orderBy("ga", "gb")
      },
      Some(s"""WITH li AS (
                SELECT strftime(l_shipdate, '%Y-%m') AS g,
                  CAST('0x' || substring(md5(
                    'kmv:' || CAST(l_partkey AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv
                FROM lineitem WHERE year(l_shipdate) = 1995),
              dis AS (SELECT DISTINCT g, hv FROM li),
              sk AS (SELECT g, hv FROM (
                  SELECT g, hv, row_number() OVER (
                    PARTITION BY g ORDER BY hv) AS rn FROM dis)
                WHERE rn <= 64),
              gs AS (SELECT DISTINCT g FROM sk),
              pairs AS (SELECT a.g AS ga, b.g AS gb
                FROM gs a JOIN gs b ON a.g < b.g),
              u AS (SELECT p.ga, p.gb, s.hv,
                  max(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
                  max(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
                FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
                GROUP BY 1, 2, 3),
              topu AS (SELECT * FROM (
                  SELECT u.*, row_number() OVER (
                    PARTITION BY ga, gb ORDER BY hv) AS rn FROM u)
                WHERE rn <= 64),
              agg AS (SELECT ga, gb,
                  CAST(count(*) AS BIGINT) AS n_held,
                  CAST(max(hv) AS BIGINT) AS h_k,
                  CAST(sum(in_a * in_b) AS BIGINT) AS k_both
                FROM topu GROUP BY 1, 2),
              est AS (SELECT ga, gb, n_held, k_both,
                  CASE WHEN n_held < 64 THEN n_held
                    ELSE CAST(CAST(63 AS HUGEINT) *
                      CAST(${Kmv.M}
                        AS HUGEINT) // CAST(h_k AS HUGEINT) AS BIGINT)
                  END AS union_est
                FROM agg)
              SELECT ga, gb, n_held, k_both, union_est,
                CASE WHEN n_held = 0 THEN NULL
                  ELSE k_both * 1000000 // n_held END AS jaccard_ppm,
                CASE WHEN n_held = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(CAST(k_both AS HUGEINT) *
                    CAST(union_est AS HUGEINT) //
                    CAST(n_held AS HUGEINT) AS BIGINT)
                END AS intersect_est
              FROM est ORDER BY ga, gb""")),

    QueryDef("x117_png_resize",
      // REAL image resize END TO END (r11, retiring resizeStub's PNG
      // leg): real PNGs synthesized from the doc ids → REAL decode →
      // nearest-neighbor resample (source pixel (x·srcW div 8,
      // y·srcH div 6) — pure integer algebra) → REAL re-encode →
      // decoded AGAIN by pngPixelStats. A defect anywhere in the
      // decode→resample→encode→decode chain breaks the sums
      // bit-for-bit. The oracle never touches image bytes: resized
      // pixel (x,y) of image id is
      // (id·31 + (x·w div 8)·7 + (y·h div 6)·13) mod 256 by
      // construction of the packRealPngs corpus
      (s, d) => Multimodal.pngPixelStats(s,
          Multimodal.resizePng(s,
            Multimodal.packRealPngs(s, documents(s, d)
              .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"),
            w = 8, h = 6))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, doc_id % 16 + 4 AS w,
                  (doc_id * 7) % 12 + 4 AS h
                FROM documents WHERE doc_id < 500),
              px AS (
                SELECT id,
                  (id * 31 + ((x.x * w) // 8) * 7
                     + ((y.y * h) // 6) * 13) % 256 AS v
                FROM imgs, range(0, 8) x(x), range(0, 6) y(y))
              SELECT id AS media_id, CAST(8 AS BIGINT) AS width,
                CAST(6 AS BIGINT) AS height,
                count(*) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM px GROUP BY 1 ORDER BY media_id""")),

    QueryDef("x118_wav_samples",
      // REAL WAV PCM sample decode (r11, the audio twin of x109):
      // complete RIFF/fmt/data WAVs synthesized from the doc ids,
      // decoded back through the chunk walk + LE sample reads, and
      // exact integer sample stats computed — the silence/clipping/
      // energy screens an audio pipeline gates on. The oracle never
      // decodes: sample i of id is ((id·37 + i·101) mod 65536) −
      // 32768 by construction, so DuckDB replays the stats as plain
      // integer algebra; any decode defect (chunk misalignment,
      // endianness, sign extension) breaks the sums bit-for-bit
      (s, d) => Multimodal.wavSampleStats(s,
          Multimodal.packRealWavs(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH w AS (
                SELECT doc_id AS id, 8000 + (doc_id % 5) * 8000 AS rate,
                  doc_id % 64 + 16 AS n
                FROM documents WHERE doc_id < 500),
              smp AS (
                SELECT id, rate,
                  (id * 37 + i.i * 101) % 65536 - 32768 AS v
                FROM w, range(0, 80) i(i) WHERE i.i < n)
              SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                count(*) AS n_samples,
                CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq,
                CAST(max(abs(v)) AS BIGINT) AS peak_abs,
                CAST(count(*) FILTER (abs(v) >= 32000) AS BIGINT)
                  AS n_clipped,
                CAST(count(*) FILTER (abs(v) < 1024) AS BIGINT)
                  AS n_silent
              FROM smp GROUP BY 1, 2 ORDER BY media_id""")),

    QueryDef("x133_audio_vad",
      // windowed voice-activity segmentation through the REAL PCM
      // decode: WAVs with an irregular voiced/silent window pattern
      // ((id·31 + w·17) mod 7 < 4, ≥2× guard band around the energy
      // gate), windowed by mapPartitions (no shuffle), gated on
      // mean |s|, and segmented with gaps-and-islands per payload —
      // the silence screens and voiced-coverage metrics a speech
      // pipeline gates on. The oracle replays the voiced RULE (never
      // decoding a byte), so any defect in the RIFF walk, window
      // bucketing, or gate arithmetic breaks the match
      (s, d) => Audio.vadSegments(Audio.audioWindows(s,
          Audio.packVadWavs(s, documents(s, d)
            .where(col("doc_id") < 400).select(col("doc_id")), "doc_id")))
        .orderBy("media_id"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 400),
              w AS (SELECT id, t.w AS win,
                      CASE WHEN (id * 31 + t.w * t.w * 13) % 7 < 4
                        THEN 1 ELSE 0 END AS v
                    FROM ids, range(0, 32) t(w) WHERE t.w < id % 24 + 8),
              isl AS (SELECT id, win, win - row_number()
                        OVER (PARTITION BY id ORDER BY win) AS g
                      FROM w WHERE v = 1),
              segs AS (SELECT id, g, count(*) AS len
                       FROM isl GROUP BY 1, 2),
              agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_segments,
                        CAST(max(len) AS BIGINT) AS longest_run,
                        CAST(sum(len) AS BIGINT) AS n_voiced
                      FROM segs GROUP BY 1),
              tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_windows
                      FROM w GROUP BY 1)
              SELECT t.id AS media_id, t.n_windows AS n_windows,
                CAST(coalesce(a.n_voiced, 0) AS BIGINT) AS n_voiced,
                CAST(coalesce(a.n_segments, 0) AS BIGINT) AS n_segments,
                CAST(coalesce(a.longest_run, 0) AS BIGINT) AS longest_run,
                CAST(coalesce(a.n_voiced, 0) * 1000000 // t.n_windows
                  AS BIGINT) AS voiced_ppm
              FROM tot t LEFT JOIN agg a ON t.id = a.id
              ORDER BY media_id""")),

    QueryDef("x134_audio_neardup",
      // audio near-dup detection: loudness fingerprints (bit w =
      // window w's voiced gate — an energy-envelope hash that
      // survives re-encoding) matched via Hamming-LSH. The copy
      // corpus pairs id with id+250 on identical PCM except ONE
      // flipped window (Hamming distance 1); banding the 32-bit
      // signature into 4×8 bits guarantees distance-h pairs agree on
      // ≥ 4−h bands, candidates come from the engine's bounded
      // bucket collect + in-row pair expansion (the MinHash-LSH
      // machinery reused for the Hamming metric), and exact
      // bit_count(xor) verifies. The oracle re-derives signatures
      // from the synthesis rule and replays banding, bucket caps,
      // and the distance filter as integer algebra
      (s, d) => Audio.nearDupPairs(Audio.fingerprints(Audio.audioWindows(s,
          Audio.packAudioCopies(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id",
            250L))))
        .orderBy("id_a", "id_b"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 500),
              sg AS (SELECT id, CAST(sum(CASE WHEN
                        (xor((id % 250) * 2654435761, t.w * 40503) % 97 < 58)
                        <> (id >= 250 AND t.w = (id % 250) % 32)
                      THEN CAST(1 AS BIGINT) << t.w ELSE 0 END)
                      AS BIGINT) AS sig
                    FROM ids, range(0, 32) t(w) GROUP BY 1),
              bandrows AS (SELECT id, b.b AS band,
                      (sig >> (b.b * 8)) & 255 AS bucket
                    FROM sg, range(0, 4) b(b)),
              ok AS (SELECT band, bucket FROM bandrows
                     GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
              cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
                       FROM bandrows x
                       JOIN ok o ON x.band = o.band AND x.bucket = o.bucket
                       JOIN bandrows y ON y.band = x.band
                         AND y.bucket = x.bucket AND x.id < y.id)
              SELECT c.id_a AS id_a, c.id_b AS id_b,
                CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
              FROM cand c
              JOIN sg sa ON c.id_a = sa.id
              JOIN sg sb ON c.id_b = sb.id
              WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
              ORDER BY id_a, id_b""")),

    QueryDef("x135_audio_resample",
      // sample-rate normalization through a FULL codec round trip:
      // x118's mixed-rate corpus (8–40 kHz) is decoded, linearly
      // resampled to 16 kHz in fixed-point integer arithmetic
      // (unsigned domain, so truncating and flooring division agree
      // on every engine), re-ENCODED as real WAVs, and the sample
      // stats computed by decoding those again — encode→resample→
      // encode→decode, all partition-parallel with no shuffle. The
      // oracle replays the interpolation as pure integer algebra
      // from the synthesis formula; one sample off by one ulp of
      // rounding breaks the sums
      (s, d) => Multimodal.wavSampleStats(s, Audio.resamplePcm(s,
          Multimodal.packRealWavs(s, documents(s, d)
            .where(col("doc_id") < 400).select(col("doc_id")), "doc_id"),
          16000))
        .orderBy("media_id"),
      Some("""WITH w AS (
                SELECT doc_id AS id, 8000 + (doc_id % 5) * 8000 AS r,
                  doc_id % 64 + 16 AS n
                FROM documents WHERE doc_id < 400),
              res AS (SELECT id, r, n, j.j AS j,
                        (j.j * r) // 16000 AS i0, (j.j * r) % 16000 AS frac
                      FROM w, range(0, 200) j(j)
                      WHERE j.j <= ((n - 1) * 16000) // r),
              sv AS (SELECT id, frac,
                       (id * 37 + i0 * 101) % 65536 - 32768 AS s0,
                       (id * 37 + least(i0 + 1, n - 1) * 101) % 65536
                         - 32768 AS s1
                     FROM res),
              v AS (SELECT id,
                      ((s0 + 32768) * (16000 - frac)
                        + (s1 + 32768) * frac) // 16000 - 32768 AS v
                    FROM sv)
              SELECT id AS media_id, CAST(16000 AS BIGINT) AS sample_rate,
                count(*) AS n_samples,
                CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq,
                CAST(max(abs(v)) AS BIGINT) AS peak_abs,
                CAST(count(*) FILTER (abs(v) >= 32000) AS BIGINT)
                  AS n_clipped,
                CAST(count(*) FILTER (abs(v) < 1024) AS BIGINT)
                  AS n_silent
              FROM v GROUP BY 1, 2 ORDER BY media_id""")),

    QueryDef("x136_audio_curate",
      // the audio curation FUNNEL — the family's capstone: a
      // mixed-defect corpus (junk bytes / silence-heavy / clipped /
      // near-dup copies / good, one class per id mod 6) through
      // decode screen → VAD gate → clipping gate → fingerprint-LSH
      // near-dup collapse (connected components, min-id survivor) in
      // ONE decode pass, emitting the one-row audit a pipeline
      // operator reads before committing a corpus. The oracle
      // replays every stage: class algebra for the gates, the x134
      // signature/banding/bucket-cap machinery for pairs, and a
      // recursive-CTE min-label propagation for the component
      // survivor rule
      (s, d) => Audio.curate(s, Audio.packCurateWavs(s,
          documents(s, d).where(col("doc_id") < 600)
            .select(col("doc_id")), "doc_id"))._2,
      Some("""WITH RECURSIVE ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 600),
              wv AS (SELECT id, t.w AS w,
                       CASE
                         WHEN id % 6 = 1 THEN
                           CASE WHEN t.w = 0 THEN 1 ELSE 0 END
                         WHEN id % 6 = 2 THEN 1
                         ELSE CASE WHEN
                           (xor((CASE WHEN id % 6 = 4 THEN id - 1
                                 ELSE id END) * 2654435761,
                                t.w * 40503) % 97 < 58)
                           <> (id % 6 = 4 AND t.w = ((id - 1) % 32))
                           THEN 1 ELSE 0 END
                       END AS v
                     FROM ids, range(0, 32) t(w) WHERE id % 6 <> 0),
              med AS (SELECT id,
                        CAST(sum(v) AS BIGINT) * 1000000 // 32
                          AS voiced_ppm
                      FROM wv GROUP BY 1),
              gate AS (SELECT id, voiced_ppm >= 250000 AS vad_ok,
                         voiced_ppm >= 250000 AND id % 6 <> 2 AS clip_ok
                       FROM med),
              sg AS (SELECT wv.id AS id, CAST(sum(CASE WHEN wv.v = 1
                         THEN CAST(1 AS BIGINT) << wv.w ELSE 0 END)
                       AS BIGINT) AS sig
                     FROM wv JOIN gate
                       ON wv.id = gate.id AND gate.clip_ok
                     GROUP BY 1),
              bandrows AS (SELECT id, b.b AS band,
                      (sig >> (b.b * 8)) & 255 AS bucket
                    FROM sg, range(0, 4) b(b)),
              ok AS (SELECT band, bucket FROM bandrows
                     GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
              cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
                       FROM bandrows x
                       JOIN ok o ON x.band = o.band AND x.bucket = o.bucket
                       JOIN bandrows y ON y.band = x.band
                         AND y.bucket = x.bucket AND x.id < y.id),
              pairs AS (SELECT c.id_a, c.id_b FROM cand c
                        JOIN sg sa ON c.id_a = sa.id
                        JOIN sg sb ON c.id_b = sb.id
                        WHERE bit_count(xor(sa.sig, sb.sig)) <= 2),
              edges AS (SELECT id_a AS s, id_b AS t FROM pairs
                        UNION ALL SELECT id_b, id_a FROM pairs),
              reach(id, r) AS (SELECT s, s FROM edges
                        UNION SELECT e.t, reach.r
                        FROM reach JOIN edges e ON e.s = reach.id),
              lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY 1),
              dropped AS (SELECT id FROM lbl WHERE label <> id)
              SELECT (SELECT count(*) FROM ids) AS n_input,
                (SELECT count(*) FROM ids WHERE id % 6 <> 0)
                  AS n_decoded,
                (SELECT count(*) FROM gate WHERE vad_ok) AS n_vad_pass,
                (SELECT count(*) FROM gate WHERE clip_ok)
                  AS n_clip_pass,
                (SELECT count(*) FROM gate WHERE clip_ok AND id NOT IN
                  (SELECT id FROM dropped)) AS n_unique""")),

    QueryDef("x137_image_neardup",
      // CROSS-FORMAT image near-dup detection: a perceptual
      // average-hash (8×8 nearest-neighbor grid, bit = sample above
      // the 64-sample mean, compared as 64·px > Σpx so no division
      // rounds) computed through the REAL decode — so a PNG and a
      // genuinely-LZW-compressed GIF of the SAME pixels collapse to
      // one signature, which is what re-encoded-copy dedup needs.
      // The copy corpus pairs id with id+250 across containers; the
      // shared Hamming-LSH (8 bands × 8 bits over the 64-bit hash)
      // recovers all 250 planted pairs at distance 0 plus the
      // corpus's honest aHash near-collisions (deterministic, and
      // the oracle replays them identically — carrying the signature
      // as HUGEINT since bit 63 overflows a signed shift)
      (s, d) => graft.operators.Dedup.hammingNearDupPairs(
          Multimodal.imageAHash(s, Multimodal.packImageCopies(s,
            documents(s, d).where(col("doc_id") < 500)
              .select(col("doc_id")), "doc_id", 250L)),
          bands = 8, bandBits = 8)
        .orderBy("id_a", "id_b"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 500),
              px AS (SELECT id, id % 250 AS k, b.b AS b,
                       ((id % 250) % 12 + 8) AS w,
                       (((id % 250) * 7) % 12 + 8) AS h
                     FROM ids, range(0, 64) b(b)),
              sm AS (SELECT id, b,
                       (((k * 1000003 + ((b % 8) * w // 8) * 131
                          + ((b // 8) * h // 8) * 31) * 2654435761)
                        % 251) AS val
                     FROM px),
              tt AS (SELECT id, CAST(sum(val) AS BIGINT) AS tot
                     FROM sm GROUP BY 1),
              sg AS (SELECT sm.id AS id, sum(CASE WHEN 64 * sm.val > tt.tot
                         THEN CAST(1 AS HUGEINT) << sm.b ELSE 0 END) AS sig
                     FROM sm JOIN tt ON sm.id = tt.id GROUP BY 1),
              bandrows AS (SELECT id, b.b AS band,
                      CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                    FROM sg, range(0, 8) b(b)),
              ok AS (SELECT band, bucket FROM bandrows
                     GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
              cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
                       FROM bandrows x
                       JOIN ok o ON x.band = o.band AND x.bucket = o.bucket
                       JOIN bandrows y ON y.band = x.band
                         AND y.bucket = x.bucket AND x.id < y.id)
              SELECT c.id_a AS id_a, c.id_b AS id_b,
                CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
              FROM cand c
              JOIN sg sa ON c.id_a = sa.id
              JOIN sg sb ON c.id_b = sb.id
              WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
              ORDER BY id_a, id_b""")),

    QueryDef("x138_media_index_probe",
      // incremental media intake against a PERSISTED fingerprint
      // index — the fingerprint tier joins the persisted-index family
      // (exact digests, MinHash sets, IVF cells, PQ codes): the PNG
      // corpus's perceptual hashes land as a shard-partitioned
      // Hamming index (sigs/ + bands/ + meta/), and the incoming GIF
      // batch probes it WITHOUT rescanning media — band-bucket
      // candidates under static shard pruning, exact bit_count
      // verify. Every cross-container copy (same pixels, different
      // codec) is recovered at distance 0; the oracle replays the
      // whole probe as signature algebra restricted to the
      // batch × corpus cross pairs
      (s, d) => {
        val all = Multimodal.packImageCopies(s,
          documents(s, d).where(col("doc_id") < 500)
            .select(col("doc_id")), "doc_id", 250L)
        val sigs = Multimodal.imageAHash(s, all)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_hamming_idx_" +
          Integer.toHexString(d.hashCode)
        graft.operators.Dedup.buildHammingIndex(
          sigs.where(col("media_id") < 250), path)
        graft.operators.Dedup.probeHammingIndex(s, path,
            sigs.where(col("media_id") >= 250))
          .orderBy("in_id", "corpus_id")
      },
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 500),
              px AS (SELECT id, id % 250 AS k, b.b AS b,
                       ((id % 250) % 12 + 8) AS w,
                       (((id % 250) * 7) % 12 + 8) AS h
                     FROM ids, range(0, 64) b(b)),
              sm AS (SELECT id, b,
                       (((k * 1000003 + ((b % 8) * w // 8) * 131
                          + ((b // 8) * h // 8) * 31) * 2654435761)
                        % 251) AS val
                     FROM px),
              tt AS (SELECT id, CAST(sum(val) AS BIGINT) AS tot
                     FROM sm GROUP BY 1),
              sg AS (SELECT sm.id AS id, sum(CASE WHEN 64 * sm.val > tt.tot
                         THEN CAST(1 AS HUGEINT) << sm.b ELSE 0 END) AS sig
                     FROM sm JOIN tt ON sm.id = tt.id GROUP BY 1),
              corpus AS (SELECT id, sig FROM sg WHERE id < 250),
              batch AS (SELECT id, sig FROM sg WHERE id >= 250),
              cb AS (SELECT id, b.b AS band,
                       CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                     FROM corpus, range(0, 8) b(b)),
              bb AS (SELECT id, b.b AS band,
                       CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                     FROM batch, range(0, 8) b(b)),
              cand AS (SELECT DISTINCT bb.id AS in_id, cb.id AS corpus_id
                       FROM bb JOIN cb ON bb.band = cb.band
                         AND bb.bucket = cb.bucket)
              SELECT c.in_id AS in_id, c.corpus_id AS corpus_id,
                CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
              FROM cand c
              JOIN batch sa ON c.in_id = sa.id
              JOIN corpus sb ON c.corpus_id = sb.id
              WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
              ORDER BY in_id, corpus_id""")),

    QueryDef("x139_media_index_takedown",
      // retention/takedown on the fingerprint tier (the x54 contract
      // for media): after deleting contents 100–149 from the
      // persisted Hamming index — a shard-pruned rewrite located by
      // the doomed ids' own STORED signatures — the GIF batch probe
      // loses exactly its pairs into the deleted ids while every
      // still-indexed copy keeps matching at distance 0. The oracle
      // is the x138 replay with the corpus restricted to live ids
      (s, d) => {
        val all = Multimodal.packImageCopies(s,
          documents(s, d).where(col("doc_id") < 500)
            .select(col("doc_id")), "doc_id", 250L)
        val sigs = Multimodal.imageAHash(s, all)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_hamming_td_" +
          Integer.toHexString(d.hashCode)
        graft.operators.Dedup.buildHammingIndex(
          sigs.where(col("media_id") < 250), path)
        graft.operators.Dedup.deleteFromHammingIndex(s, path,
          documents(s, d)
            .where(col("doc_id") >= 100 && col("doc_id") < 150)
            .select(col("doc_id")), "doc_id")
        graft.operators.Dedup.probeHammingIndex(s, path,
            sigs.where(col("media_id") >= 250))
          .orderBy("in_id", "corpus_id")
      },
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 500),
              px AS (SELECT id, id % 250 AS k, b.b AS b,
                       ((id % 250) % 12 + 8) AS w,
                       (((id % 250) * 7) % 12 + 8) AS h
                     FROM ids, range(0, 64) b(b)),
              sm AS (SELECT id, b,
                       (((k * 1000003 + ((b % 8) * w // 8) * 131
                          + ((b // 8) * h // 8) * 31) * 2654435761)
                        % 251) AS val
                     FROM px),
              tt AS (SELECT id, CAST(sum(val) AS BIGINT) AS tot
                     FROM sm GROUP BY 1),
              sg AS (SELECT sm.id AS id, sum(CASE WHEN 64 * sm.val > tt.tot
                         THEN CAST(1 AS HUGEINT) << sm.b ELSE 0 END) AS sig
                     FROM sm JOIN tt ON sm.id = tt.id GROUP BY 1),
              corpus AS (SELECT id, sig FROM sg
                         WHERE id < 100 OR (id >= 150 AND id < 250)),
              batch AS (SELECT id, sig FROM sg WHERE id >= 250),
              cb AS (SELECT id, b.b AS band,
                       CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                     FROM corpus, range(0, 8) b(b)),
              bb AS (SELECT id, b.b AS band,
                       CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                     FROM batch, range(0, 8) b(b)),
              cand AS (SELECT DISTINCT bb.id AS in_id, cb.id AS corpus_id
                       FROM bb JOIN cb ON bb.band = cb.band
                         AND bb.bucket = cb.bucket)
              SELECT c.in_id AS in_id, c.corpus_id AS corpus_id,
                CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
              FROM cand c
              JOIN batch sa ON c.in_id = sa.id
              JOIN corpus sb ON c.corpus_id = sb.id
              WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
              ORDER BY in_id, corpus_id""")),

    QueryDef("x140_mp4_info",
      // REAL MP4 container metadata through a genuine box WALK: the
      // payloads are spec-shaped box trees (ftyp, an id-length `free`
      // padding box that SHIFTS every later offset, moov{mvhd,
      // trak{mdia{mdhd}}×n}, mdat) and the parser honors sizes and
      // skips unknowns — no fixed offsets anywhere. Brand, movie
      // timescale, duration (ticks + floored ms), and track count
      // are the screens a video pipeline gates on before any codec
      // work; the oracle replays them from the id algebra
      (s, d) => Multimodal.mp4Info(s, Multimodal.packRealMp4s(s,
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id")), "doc_id"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
                  AS brand,
                CAST(1000 * (doc_id % 4 + 1) AS BIGINT) AS timescale,
                CAST((doc_id % 90000) + 100 AS BIGINT) AS duration_ticks,
                CAST(((doc_id % 90000) + 100) * 1000
                  // (1000 * (doc_id % 4 + 1)) AS BIGINT) AS duration_ms,
                CAST(doc_id % 3 + 1 AS BIGINT) AS n_tracks
              FROM documents WHERE doc_id < 400 ORDER BY media_id""")),

    QueryDef("x141_duration_sample",
      // duration-weighted clip sampling — media metadata driving the
      // sampling tier: each clip survives with probability
      // duration/max_duration (long clips ~always, short clips
      // proportionally less — the duration-balanced pick a
      // speech/video pipeline uses so wall-clock hours, not clip
      // counts, define the mixture). The weight is exact integer ppm
      // (duration·1e6 div max via a broadcast 1-row max), the draw
      // the engine's salted md5 primitive — the whole survivor set
      // replays externally, composed from the REAL mp4 box walk
      (s, d) => {
        val info = Multimodal.mp4Info(s, Multimodal.packRealMp4s(s,
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id")), "doc_id"))
        val mx = info.agg(max("duration_ms").as("__mx"))
        val weighted = info.crossJoin(broadcast(mx))
          .withColumn("w_ppm",
            expr("duration_ms * CAST(1000000 AS BIGINT) DIV __mx"))
        Sampling.deterministicSampleByRatePpm(weighted, "media_id",
            col("w_ppm"), salt = "dur")
          .select("media_id", "duration_ms", "w_ppm")
          .orderBy("media_id")
      },
      Some("""WITH info AS (
                SELECT doc_id AS media_id,
                  CAST(((doc_id % 90000) + 100) * 1000
                    // (1000 * (doc_id % 4 + 1)) AS BIGINT) AS duration_ms
                FROM documents WHERE doc_id < 400),
              mx AS (SELECT max(duration_ms) AS m FROM info)
              SELECT media_id, duration_ms,
                CAST(duration_ms * 1000000 // mx.m AS BIGINT) AS w_ppm
              FROM info, mx
              WHERE CAST('0x' || substring(
                      md5('dur:' || CAST(media_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 1000000
                  < duration_ms * 1000000 // mx.m
              ORDER BY media_id""")),

    QueryDef("x142_audio_normalize",
      // peak (gain) normalization through the full codec round trip
      // (the x135 shape for loudness): every clip rescaled so its
      // peak |sample| hits 30000 — quiet clips amplify, loud clips
      // attenuate — with the sign split out so every division runs
      // non-negative (truncating == flooring == replayable). Stats
      // computed by DECODING the re-encoded output; the oracle
      // replays decode → peak → scale → stats as integer algebra
      (s, d) => Multimodal.wavSampleStats(s, Audio.normalizePeak(s,
          Multimodal.packRealWavs(s, documents(s, d)
            .where(col("doc_id") < 400).select(col("doc_id")),
            "doc_id")))
        .orderBy("media_id"),
      Some("""WITH w AS (
                SELECT doc_id AS id, 8000 + (doc_id % 5) * 8000 AS rate,
                  doc_id % 64 + 16 AS n
                FROM documents WHERE doc_id < 400),
              smp AS (SELECT id, rate,
                        (id * 37 + i.i * 101) % 65536 - 32768 AS v
                      FROM w, range(0, 80) i(i) WHERE i.i < n),
              pk AS (SELECT id, max(abs(v)) AS peak FROM smp GROUP BY 1),
              nv AS (SELECT smp.id AS id, smp.rate AS rate,
                       CASE WHEN pk.peak = 0 THEN v
                            WHEN v < 0 THEN -(abs(v) * 30000 // pk.peak)
                            ELSE abs(v) * 30000 // pk.peak END AS v
                     FROM smp JOIN pk ON smp.id = pk.id)
              SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                count(*) AS n_samples,
                CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq,
                CAST(max(abs(v)) AS BIGINT) AS peak_abs,
                CAST(count(*) FILTER (abs(v) >= 32000) AS BIGINT)
                  AS n_clipped,
                CAST(count(*) FILTER (abs(v) < 1024) AS BIGINT)
                  AS n_silent
              FROM nv GROUP BY 1, 2 ORDER BY media_id""")),

    QueryDef("x143_tar_members",
      // REAL TAR shard enumeration — the WebDataset manifest scan:
      // genuine ustar archives (octal fields, SPEC header checksum,
      // 512-block padding) walked header by header; each member row
      // carries its name, absolute data offset, size, and the exact
      // byte sum of the member data (summing forces a real read at
      // the claimed offset — one block-walk defect and every sum
      // shifts). Corrupted checksums screen the shard. The oracle
      // replays offsets as a running 512-aligned sum and the sums as
      // id algebra
      (s, d) => Multimodal.tarMembers(s, Multimodal.packTarShards(s,
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id")), "doc_id"))
        .orderBy("shard_id", "name"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 400),
              mem AS (SELECT id, j.j AS j,
                        CAST((id * 7 + j.j * 13) % 900 + 10 AS BIGINT)
                          AS size
                      FROM ids, range(0, 4) j(j) WHERE j.j < id % 3 + 2),
              offs AS (SELECT id, j, size,
                         512 + coalesce(sum(512 + 512 * ((size + 511) // 512))
                           OVER (PARTITION BY id ORDER BY j
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS data_off
                       FROM mem),
              sums AS (SELECT m.id AS id, m.j AS j,
                         CAST(sum((m.id * 11 + m.j * 17 + p.p * 5) % 251)
                           AS BIGINT) AS byte_sum
                       FROM mem m, range(0, 910) p(p) WHERE p.p < m.size
                       GROUP BY 1, 2)
              SELECT o.id AS shard_id,
                'doc-' || o.id || '-' || o.j || '.txt' AS name,
                CAST(o.data_off AS BIGINT) AS data_off,
                o.size AS size, s.byte_sum AS byte_sum
              FROM offs o JOIN sums s ON o.id = s.id AND o.j = s.j
              ORDER BY shard_id, name""")),

    QueryDef("x144_gzip_decode",
      // REAL gzip decode (RFC 1952) with the loader's integrity
      // contract: header fields parsed (optional FEXTRA/FNAME/
      // FCOMMENT/FHCRC skipped by their own lengths), raw-deflate
      // inflated, CRC32 + ISIZE trailer VERIFIED — a member that
      // inflates but fails its checksum screens out. Compressed text
      // shards (.json.gz / .txt.gz) are how web corpora actually
      // ship. The oracle replays the DECODED size and byte sum from
      // the synthesis formula — reachable only through a correct
      // inflate — while the JDK-specific compressed size stays out
      // of the oracle (the compressionRatio rule), covered by spec
      (s, d) => Multimodal.gzipDocStats(s, Multimodal.packGzipDocs(s,
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id")), "doc_id"))
        .select("media_id", "n_bytes", "byte_sum")
        .orderBy("media_id"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 400)
              SELECT id AS media_id,
                CAST(id % 900 + 10 AS BIGINT) AS n_bytes,
                CAST(sum((id * 11 + p.p * 5) % 95 + 32) AS BIGINT)
                  AS byte_sum
              FROM ids, range(0, 910) p(p) WHERE p.p < id % 900 + 10
              GROUP BY 1, 2 ORDER BY media_id""")),

    QueryDef("x145_shard_pipeline",
      // the WebDataset READ PATH end to end: real ustar shards whose
      // members are real gzip files — per shard, ONE partition-
      // parallel pass walks the verified tar headers, slices each
      // member at its claimed offset, gunzips it under CRC/ISIZE
      // verification, and emits decoded doc stats. No shuffle, no
      // join, blobs never leave their partition — the loader shape a
      // multimodal training job runs over thousands of shards. The
      // oracle replays decoded sizes and byte sums from the synthesis
      // formula, reachable only through a correct walk + slice +
      // inflate chain
      (s, d) => Multimodal.shardDocStats(s, Multimodal.packWebShards(s,
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id")), "doc_id"))
        .orderBy("shard_id", "name"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 400),
              mem AS (SELECT id, j.j AS j,
                        CAST((id * 7 + j.j * 13) % 900 + 10 AS BIGINT)
                          AS n_bytes
                      FROM ids, range(0, 4) j(j) WHERE j.j < id % 3 + 2),
              sums AS (SELECT m.id AS id, m.j AS j, m.n_bytes AS n_bytes,
                         CAST(sum((m.id * 11 + m.j * 17 + p.p * 5) % 95
                           + 32) AS BIGINT) AS byte_sum
                       FROM mem m, range(0, 910) p(p) WHERE p.p < m.n_bytes
                       GROUP BY 1, 2, 3)
              SELECT id AS shard_id,
                'doc-' || id || '-' || j || '.txt.gz' AS name,
                n_bytes, byte_sum
              FROM sums ORDER BY shard_id, name""")),

    QueryDef("x146_shard_roundtrip",
      // the WebDataset WRITE path closed into a round-trip identity:
      // real documents pack into real shards (groupByKey on the id-
      // range shard key, one shard materialized per task) and the
      // full read path recovers every document byte-for-byte — the
      // oracle compares the md5 of each DECODED member against
      // DuckDB's own md5 of the original text, so one byte anywhere
      // in the gzip/tar/slice/inflate chain and the digests diverge.
      // This is the corpus-export shape a training job consumes
      (s, d) => Multimodal.shardDocDigests(s, Multimodal.writeWebShards(
          documents(s, d).where(col("doc_id") < 400)
            .select(col("doc_id"), col("text")), "doc_id", "text",
          docsPerShard = 16))
        .orderBy("shard_id", "name"),
      Some("""SELECT doc_id // 16 AS shard_id,
                'doc-' || doc_id || '.txt.gz' AS name,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS digest
              FROM documents WHERE doc_id < 400
              ORDER BY shard_id, name""")),

    QueryDef("x120_gif_pixels",
      // REAL GIF pixel decode (r11, the third real-decode leg after
      // PNG and WAV): complete GIF89a payloads with GENUINELY
      // LZW-compressed image data are synthesized from the doc ids,
      // decoded back through the full variable-width LZW decoder
      // (code table growth, clear handling, sub-block reassembly,
      // palette lookup), and exact integer pixel stats computed. The
      // oracle never decodes: every pixel is (id·29 + x·11 + y·17)
      // mod 256 with an identity grayscale palette by construction,
      // so any LZW defect (width change off-by-one, KwKwK, packing)
      // breaks the sums bit-for-bit
      (s, d) => Multimodal.gifPixelStats(s,
          Multimodal.packRealGifs(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, doc_id % 14 + 4 AS w,
                  (doc_id * 5) % 10 + 4 AS h
                FROM documents WHERE doc_id < 500),
              px AS (
                SELECT id, w, h,
                  (id * 29 + x.x * 11 + y.y * 17) % 256 AS v
                FROM imgs, range(0, 18) x(x), range(0, 14) y(y)
                WHERE x.x < w AND y.y < h)
              SELECT id AS media_id, w AS width, h AS height,
                count(*) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM px GROUP BY 1, 2, 3 ORDER BY media_id""")),

    QueryDef("x121_url_canon",
      // URL CANONICALIZATION (r11) — the first dedup key of every
      // web-crawl pipeline: scheme/host case, www., default ports,
      // trailing slashes, fragments, tracking params, and query-param
      // order all collapse, so equal resources become string-equal
      // BEFORE any content dedup runs. Messy URLs are synthesized
      // from the doc ids (every variant class represented: HTTP/https
      // case, :80/:443/none, five path shapes, utm/ref/plain/empty
      // queries, fragments), canonicalized in pure codegen'd column
      // algebra (no UDF), and the oracle replays both the synthesis
      // and all seven normalization steps in SQL
      (s, d) => {
        val id = col("doc_id")
        val url = messyUrl(id)
        documents(s, d).where(id < 2000)
          .select(id.as("doc_id"), url.as("url"),
            Urls.canonicalizeUrl(url).as("canon_url"))
          .orderBy("doc_id")
      },
      Some("WITH " + urlCanonCtes + """
              SELECT doc_id, url, canon_url
              FROM canon ORDER BY doc_id""")),

    QueryDef("x130_url_dedup",
      // the canonical URL AS the dedup key (r11): the integration the
      // canonicalizer exists for — group captures by canon_url, count
      // collapsed variants, keep the smallest doc_id as the survivor
      // (the deterministic first-write-wins rule). Output = only the
      // groups where canonicalization actually collapsed something,
      // so the row set IS the measured dedup win
      (s, d) => {
        val id = col("doc_id")
        documents(s, d).where(id < 2000)
          .select(id.as("doc_id"),
            Urls.canonicalizeUrl(messyUrl(id)).as("canon_url"))
          .groupBy("canon_url")
          .agg(count(lit(1)).as("n_variants"),
            min("doc_id").as("survivor_id"))
          .where(col("n_variants") > 1)
          .orderBy("canon_url")
      },
      Some("WITH " + urlCanonCtes + """
              SELECT canon_url,
                CAST(count(*) AS BIGINT) AS n_variants,
                CAST(min(doc_id) AS BIGINT) AS survivor_id
              FROM canon GROUP BY 1 HAVING count(*) > 1
              ORDER BY canon_url""")),

    QueryDef("x190_jpeg_pixels",
      // REAL baseline JPEG pixel decode (r17 — the x109 pattern
      // extended to the entropy-coded majority crawl format, retiring
      // the last image stub): deterministic COMPLETE baseline JPEGs
      // (genuine DC-DPCM Huffman entropy coding with the standard
      // Annex K tables, quant table all-ones, every third id carrying
      // real RSTn restart markers) synthesized from the doc ids,
      // decoded back through the marker walk + Huffman + IDCT, exact
      // integer pixel stats computed. Block-CONSTANT content is what
      // makes a lossy format oracle-replayable: a DC-only block IDCTs
      // back to its exact constant, so DuckDB replays the stats as
      // block algebra — any defect in the Huffman tables, the DPCM
      // chain, restart handling, dequant or the IDCT scaling breaks
      // the sums bit-for-bit
      (s, d) => Multimodal.jpegPixelStats(s,
          Multimodal.packRealJpegs(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, (doc_id % 4 + 1) AS bw,
                  ((doc_id * 5) % 3 + 1) AS bh
                FROM documents WHERE doc_id < 500),
              blk AS (
                SELECT id, bw, bh,
                  (id * 37 + bx.x * 11 + by.y * 19) % 256 AS v
                FROM imgs, range(0, 4) bx(x), range(0, 3) by(y)
                WHERE bx.x < bw AND by.y < bh)
              SELECT id AS media_id, CAST(8 * bw AS BIGINT) AS width,
                CAST(8 * bh AS BIGINT) AS height,
                CAST(64 * bw * bh AS BIGINT) AS n_pixels,
                CAST(64 * sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(64 * count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM blk GROUP BY id, bw, bh ORDER BY media_id""")),

    QueryDef("x191_jpeg_crossformat",
      // CROSS-FORMAT near-dup across the lossy/lossless boundary
      // (r17 — completes the x137 family for PNG↔JPEG): the same
      // block-constant pixels packed as a real PNG and a real
      // baseline JPEG collapse to ONE aHash signature (DC-only blocks
      // decode exactly), so the shared Hamming-LSH recovers every
      // planted cross-container pair at distance 0 — the re-encoded-
      // copy dedup shape a crawled image corpus actually needs, where
      // the copy was saved through a different codec than the
      // original. Same banded machinery and oracle shape as x137
      (s, d) => graft.operators.Dedup.hammingNearDupPairs(
          Multimodal.imageAHash(s, Multimodal.packJpegPngCopies(s,
            documents(s, d).where(col("doc_id") < 500)
              .select(col("doc_id")), "doc_id", 250L)),
          bands = 8, bandBits = 8)
        .orderBy("id_a", "id_b"),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 500),
              px AS (SELECT id, id % 250 AS k, b.b AS b,
                       (8 * ((id % 250) % 3 + 1)) AS w,
                       (8 * (((id % 250) * 7) % 4 + 1)) AS h
                     FROM ids, range(0, 64) b(b)),
              sm AS (SELECT id, b,
                       (((k * 1000003
                          + (((b % 8) * w // 8) // 8) * 131
                          + (((b // 8) * h // 8) // 8) * 19)
                         * 2654435761) % 251) AS val
                     FROM px),
              tt AS (SELECT id, CAST(sum(val) AS BIGINT) AS tot
                     FROM sm GROUP BY 1),
              sg AS (SELECT sm.id AS id, sum(CASE WHEN 64 * sm.val > tt.tot
                         THEN CAST(1 AS HUGEINT) << sm.b ELSE 0 END) AS sig
                     FROM sm JOIN tt ON sm.id = tt.id GROUP BY 1),
              bandrows AS (SELECT id, b.b AS band,
                      CAST((sig >> (b.b * 8)) & 255 AS BIGINT) AS bucket
                    FROM sg, range(0, 8) b(b)),
              ok AS (SELECT band, bucket FROM bandrows
                     GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
              cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
                       FROM bandrows x
                       JOIN ok o ON x.band = o.band AND x.bucket = o.bucket
                       JOIN bandrows y ON y.band = x.band
                         AND y.bucket = x.bucket AND x.id < y.id)
              SELECT c.id_a AS id_a, c.id_b AS id_b,
                CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
              FROM cand c
              JOIN sg sa ON c.id_a = sa.id
              JOIN sg sb ON c.id_b = sb.id
              WHERE bit_count(xor(sa.sig, sb.sig)) <= 2
              ORDER BY id_a, id_b""")),

    QueryDef("x193_mp3_frames",
      // REAL MP3 frame-header walk (r17 — the audio twin of the JPEG
      // SOF walk): an MPEG-1 Layer III stream's whole geometry lives
      // in fixed 32-bit frame headers, so frame count, duration and
      // mean bitrate — the duration-cap / bitrate-floor / truncation
      // screens an audio-corpus pipeline gates on — are REAL metadata
      // with zero entropy decoding. The synthetic framings are
      // genuine headers (id-derived per-frame bitrate indices, all
      // three sample rates, padding bits, ID3v2 prefixes every third
      // id, trailing ID3v1 tags every fifth) with zero-filled
      // payloads (the SAMPLE decode stays the contract stub; the
      // structure is real); the oracle replays the whole walk as id
      // algebra over the public bitrate table
      (s, d) => Audio.mp3Stats(s,
          Audio.packRealMp3s(s, documents(s, d)
            .where(col("doc_id") < 400).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH ids AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 400),
              fr AS (SELECT id, (id % 9 + 2) AS frames, (id % 3) AS sri,
                       ((id * 7 + f.f) % 14 + 1) AS br
                     FROM ids, range(0, 11) f(f) WHERE f.f < id % 9 + 2),
              kb AS (SELECT id, frames, sri, sum(CASE br
                       WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                       WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                       WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                       WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                       WHEN 13 THEN 256 ELSE 320 END) AS s,
                       CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000
                         ELSE 32000 END AS rate
                     FROM fr GROUP BY 1, 2, 3)
              SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(frames * 1152 * 1000 // rate AS BIGINT)
                  AS duration_ms,
                CAST(s // frames AS BIGINT) AS mean_kbps
              FROM kb ORDER BY media_id"""))
  )
}
