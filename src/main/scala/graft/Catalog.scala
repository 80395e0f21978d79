package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One declared query per implemented operator (SURVEY §2 inventory +
  * north-star extensions), each paired with ANSI SQL the driver runs
  * in DuckDB over the same parquet tables (CORRECTNESS gate).
  *
  * Conventions that make the hash-compare deterministic:
  *  - every query ends with an ORDER BY on a unique column set, in
  *    both the Spark plan and the oracle SQL;
  *  - money-ish double sums go through DECIMAL(18,4) (exact,
  *    order-independent) and back to DOUBLE;
  *  - remaining double outputs are rounded on both sides;
  *  - timestamps are emitted as formatted strings (no physical-type
  *    ambiguity between writers).
  */
object Catalog {

  final case class QueryDef(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      headline: Boolean = false)

  import Tables._

  /** decimal-exact sum of a double column expression, emitted as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** DuckDB cosine-similarity fragment between two float-list columns —
    * the exact double algebra `Similarity.cosine` computes (and that
    * x06 proves hash-compatible at 4dp). */
  private def cosineSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

  /** DuckDB fragment: the integer sign-LSH bucket of a float-list
    * column `v` under [[graft.operators.Similarity.portablePlanes]]
    * (dim 64) — replays hyperplaneBucket bit-for-bit. */
  /** The x121/x130 messy-URL synthesizer: every canonicalization
    * variant class represented, all derived from the id (replayable
    * in the oracle as string algebra). */
  private def messyUrl(id: Column): Column = concat(
    when(id % 2 === 0, lit("HTTP")).otherwise(lit("https")),
    lit("://WWW.Site"), (id % 7).cast("string"), lit(".EXAMPLE.com"),
    when(id % 3 === 0, lit(":80"))
      .when(id % 3 === 1, lit(":443")).otherwise(lit("")),
    when(id % 5 === 0, lit("")).when(id % 5 === 1, lit("/A/B/"))
      .when(id % 5 === 2, lit("/A/B")).when(id % 5 === 3, lit("/"))
      .otherwise(concat(lit("/x/"), (id % 11).cast("string"))),
    when(id % 4 === 0, concat(lit("?utm_source=tw&b="),
        (id % 13).cast("string"), lit("&a=1")))
      .when(id % 4 === 1, concat(lit("?a=1&b="),
        (id % 13).cast("string")))
      .when(id % 4 === 2, lit("?ref=home")).otherwise(lit("")),
    when(id % 6 === 0, concat(lit("#sec"), (id % 9).cast("string")))
      .otherwise(lit("")))

  /** The x121/x130 oracle CTE chain (plain string — the regex `$`
    * anchors forbid s-interpolation): replays [[messyUrl]] and all
    * seven canonicalization steps, ending in
    * `canon(doc_id, url, canon_url)`. */
  private val urlCanonCtes: String = """d AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
                  || '://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.EXAMPLE.com'
                  || (CASE doc_id % 3 WHEN 0 THEN ':80'
                        WHEN 1 THEN ':443' ELSE '' END)
                  || (CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/A/B/'
                        WHEN 2 THEN '/A/B' WHEN 3 THEN '/'
                        ELSE '/x/' || CAST(doc_id % 11 AS VARCHAR) END)
                  || (CASE doc_id % 4
                        WHEN 0 THEN '?utm_source=tw&b='
                          || CAST(doc_id % 13 AS VARCHAR) || '&a=1'
                        WHEN 1 THEN '?a=1&b='
                          || CAST(doc_id % 13 AS VARCHAR)
                        WHEN 2 THEN '?ref=home' ELSE '' END)
                  || (CASE WHEN doc_id % 6 = 0
                        THEN '#sec' || CAST(doc_id % 9 AS VARCHAR)
                        ELSE '' END) AS url
                FROM documents WHERE doc_id < 2000),
              s1 AS (SELECT doc_id, url,
                  regexp_replace(url, '#.*$', '') AS nofrag FROM d),
              s2 AS (SELECT *,
                  lower(regexp_extract(nofrag,
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                  regexp_replace(nofrag,
                    '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM s1),
              s3 AS (SELECT *,
                  regexp_replace(lower(regexp_extract(rest,
                    '^([^/?]*)', 1)), '^www\.', '') AS hostport,
                  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s2),
              s4 AS (SELECT *,
                  CASE WHEN scheme = 'http'
                      THEN regexp_replace(hostport, ':80$', '')
                    WHEN scheme = 'https'
                      THEN regexp_replace(hostport, ':443$', '')
                    ELSE hostport END AS host,
                  regexp_extract(pathq, '^([^?]*)', 1) AS rawpath,
                  regexp_extract(pathq, '\?(.*)$', 1) AS q FROM s3),
              s5 AS (SELECT *,
                  CASE WHEN rawpath = '' THEN '/'
                    ELSE regexp_replace(rawpath, '(.)/+$', '\1') END AS path,
                  coalesce(array_to_string(list_sort(list_filter(
                    string_split(q, '&'),
                    x -> NOT regexp_matches(x,
                        '^(utm_[^=]*|fbclid|gclid|ref)=')
                      AND x <> '')), '&'), '') AS sortedq FROM s4),
              canon AS (SELECT doc_id, url,
                scheme || '://' || host || path ||
                  (CASE WHEN sortedq = '' THEN ''
                    ELSE '?' || sortedq END) AS canon_url
              FROM s5)"""

  private def bucketSql(v: String, planes: Int): String =
    s"""list_sum(list_transform(range(0, $planes), p ->
          CASE WHEN list_sum(list_transform(range(0, 64), d ->
              (((1103515245 * (p * 64 + d + 1) + 12345) % 2147483648)
                % 1000001 - 500000)
              * CAST(floor(CAST($v[CAST(d + 1 AS INT)] AS DOUBLE) * 1000000) AS BIGINT))) >= 0
            THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END))"""

  /** q08's genuine one-pass shape for scale: materialize the shared
    * (suppkey, returnflag) aggregate to the lake, then build all three
    * full-outer sides from the read-back. Catalyst pushes the per-side
    * flag filters below a shared in-plan aggregate (un-sharing it into
    * three lineitem scans — see the q08 NOTE); with the base
    * materialized, lineitem is scanned EXACTLY once (in the write job)
    * and each side scans only the tiny aggregate. Same rows as q08. */
  def goldJoinFromMaterializedBase(s: SparkSession, d: String,
      basePath: String): DataFrame = {
    val base = graft.operators.Materialize.toLake(
      lineitem(s, d)
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("qty")),
      basePath)
    def side(flag: String, alias: String) = base
      .where(col("l_returnflag") === flag)
      .select(col("l_suppkey"), col("qty").as(s"${alias}_qty"))
    Seq(side("A", "a"), side("N", "n"), side("R", "r"))
      .reduce(_.join(_, Seq("l_suppkey"), "full_outer"))
      .orderBy("l_suppkey")
  }

  /** A fresh (deleted-if-present) TxLog table root for the x147–x151
    * family — per (tag, sf dir) so queries are idempotent across
    * verify re-runs and never collide across SFs. */
  private def freshTxRoot(s: SparkSession, tag: String, d: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_tx_${tag}_" +
      Integer.toHexString(d.hashCode)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  /** The x147–x151 base slice: (doc_id, text) under 2000 — 500 docs
    * at sf0.001/0.01, 2000 at sf0.1. */
  private def txDocs(s: SparkSession, d: String) =
    documents(s, d).where(col("doc_id") < 2000)
      .select(col("doc_id"), col("text"))

  /** The x152–x154 oracle: the FULL Naive Bayes train chain in SQL —
    * tokenize/bigram/hash the even-doc training slice (the x97
    * feature algebra, salt `nb`), per-(lang, bucket) counts, the
    * full-domain smoothed model in Long micro-nats, and log-priors —
    * ending in `model(lang, bucket, lp)` + `pri(lang, lp)`. */
  private val nbOracleCtes: String = """trd AS (
                SELECT lang, text FROM documents WHERE doc_id % 2 = 0),
              trt AS (SELECT lang,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM trd),
              trf AS (SELECT lang, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM trt),
              trb AS (SELECT lang,
                  CAST(CAST('0x' || substring(md5('nb:' || feat), 1, 15)
                    AS BIGINT) % 1024 AS INT) AS bucket
                FROM trf),
              cnt AS (SELECT lang, bucket, count(*) AS c
                      FROM trb GROUP BY 1, 2),
              tf AS (SELECT lang, count(*) AS t FROM trb GROUP BY 1),
              nd AS (SELECT lang, count(*) AS n FROM trd GROUP BY 1),
              tot AS (SELECT count(*) AS n FROM trd),
              grid AS (SELECT nd.lang AS lang, CAST(b.b AS INT) AS bucket
                       FROM nd, range(0, 1024) b(b)),
              model AS (SELECT g.lang, g.bucket,
                  CAST(round(1000000.0 * (ln(coalesce(c.c, 0) + 1)
                    - ln(tf.t + 1024))) AS BIGINT) AS lp
                FROM grid g JOIN tf ON g.lang = tf.lang
                LEFT JOIN cnt c
                  ON g.lang = c.lang AND g.bucket = c.bucket),
              pri AS (SELECT nd.lang,
                  CAST(round(1000000.0 * (ln(nd.n) - ln(tot.n)))
                    AS BIGINT) AS lp
                FROM nd, tot)"""

  /** The x153/x154 classify tail: score the odd-doc test slice under
    * `model`+`pri`, ending in `pred(doc_id, actual, predicted,
    * score_unats, n_feats)`. Ties break (score DESC, label DESC) —
    * the max-of-struct order on the Spark side. A doc whose text
    * normalizes to ZERO features takes the prior-argmax fallback with
    * n_feats = 0 (nbClassify's fallback row) — the LEFT JOIN + `fbk`
    * CTE pins that semantic in the oracle instead of dropping such
    * docs (r13: the pre-fix inner join only matched because the
    * synthetic corpus happens to contain no feature-less doc). */
  private val nbClassifyCtes: String = nbOracleCtes + """,
              te AS (SELECT doc_id, lang, text FROM documents
                     WHERE doc_id % 2 = 1),
              tet AS (SELECT doc_id,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM te),
              tef AS (SELECT doc_id, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM tet),
              teb AS (SELECT doc_id,
                  CAST(CAST('0x' || substring(md5('nb:' || feat), 1, 15)
                    AS BIGINT) % 1024 AS INT) AS bucket
                FROM tef),
              sc AS (SELECT t.doc_id, m.lang AS label,
                  CAST(p.lp + sum(m.lp) AS BIGINT) AS score,
                  count(*) AS nf
                FROM teb t JOIN model m ON t.bucket = m.bucket
                JOIN pri p ON m.lang = p.lang
                GROUP BY 1, 2, p.lp),
              pick AS (SELECT doc_id, label, score, nf,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, label DESC) AS rn
                FROM sc),
              fbk AS (SELECT label, lp FROM pri
                      ORDER BY lp DESC, label DESC LIMIT 1),
              pred AS (SELECT te.doc_id AS doc_id, te.lang AS actual,
                  coalesce(p.label, f.label) AS predicted,
                  coalesce(p.score, f.lp) AS score_unats,
                  coalesce(p.nf, 0) AS n_feats
                FROM te LEFT JOIN pick p
                  ON te.doc_id = p.doc_id AND p.rn = 1
                CROSS JOIN fbk f)"""

  /** The x157/x159 oracle: the hard-sigmoid GD cascade unrolled —
    * integer features (with doc_id carried for the scoring tail),
    * three gradient/update rounds in exact integer algebra with
    * TRUNCATING division (DuckDB `//` rounds toward zero, matching
    * Long `/`), ending in weight CTEs `wa`/`wb`/`wc`. */
  private val logitOracleCtes: String = """ft AS (
                SELECT doc_id,
                  CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y,
                  CAST(1 AS BIGINT) AS x0,
                  CAST(least(len(list_filter(string_split(
                      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                      ' '), t -> t <> '')), 200) - 50 AS BIGINT) AS x1,
                  CAST(least(length(text) // 10, 60) - 30 AS BIGINT) AS x2
                FROM documents WHERE doc_id < 2000),
              nn AS (SELECT count(*) AS n FROM ft),
              ga AS (SELECT CAST(sum(x0 * (500000 - y)) AS BIGINT) AS g0,
                       CAST(sum(x1 * (500000 - y)) AS BIGINT) AS g1,
                       CAST(sum(x2 * (500000 - y)) AS BIGINT) AS g2
                     FROM ft),
              wa AS (SELECT 0 - g0 // (1000 * n) AS a,
                       0 - g1 // (1000 * n) AS b,
                       0 - g2 // (1000 * n) AS c
                     FROM ga, nn),
              pb AS (SELECT ft.y, ft.x0, ft.x1, ft.x2,
                       (greatest(-2000000, least(2000000,
                          wa.a * ft.x0 + wa.b * ft.x1 + wa.c * ft.x2))
                        + 2000000) // 4 AS p
                     FROM ft, wa),
              gb AS (SELECT CAST(sum(x0 * (p - y)) AS BIGINT) AS g0,
                       CAST(sum(x1 * (p - y)) AS BIGINT) AS g1,
                       CAST(sum(x2 * (p - y)) AS BIGINT) AS g2
                     FROM pb),
              wb AS (SELECT wa.a - g0 // (1000 * n) AS a,
                       wa.b - g1 // (1000 * n) AS b,
                       wa.c - g2 // (1000 * n) AS c
                     FROM wa, gb, nn),
              pc AS (SELECT ft.y, ft.x0, ft.x1, ft.x2,
                       (greatest(-2000000, least(2000000,
                          wb.a * ft.x0 + wb.b * ft.x1 + wb.c * ft.x2))
                        + 2000000) // 4 AS p
                     FROM ft, wb),
              gc AS (SELECT CAST(sum(x0 * (p - y)) AS BIGINT) AS g0,
                       CAST(sum(x1 * (p - y)) AS BIGINT) AS g1,
                       CAST(sum(x2 * (p - y)) AS BIGINT) AS g2
                     FROM pc),
              wc AS (SELECT wb.a - g0 // (1000 * n) AS a,
                       wb.b - g1 // (1000 * n) AS b,
                       wb.c - g2 // (1000 * n) AS c
                     FROM wb, gc, nn)"""

  val entries: Seq[QueryDef] = Seq(

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
              FROM f ORDER BY code_site, hour_ts""")),

    // ================================================= extensions: dedup
    QueryDef("x01_dedup_exact",
      (s, d) => Dedup.exactGroups(documents(s, d), "doc_id", col("text"))
        .select("digest", "group_size", "survivor_id")
        .orderBy("survivor_id"),
      Some("""SELECT md5(text) AS digest, count(*) AS group_size,
                min(doc_id) AS survivor_id
              FROM documents GROUP BY md5(text) ORDER BY survivor_id"""),
      headline = true),

    QueryDef("x02_dedup_fingerprint",
      (s, d) => {
        val doc = documents(s, d)
          .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        doc.groupBy("fp")
          .agg(count(lit(1)).as("group_size"), min("doc_id").as("survivor_id"))
          .orderBy("survivor_id")
      },
      Some("""SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
                count(*) AS group_size, min(doc_id) AS survivor_id
              FROM documents
              GROUP BY 1 ORDER BY survivor_id""")),

    QueryDef("x03_minhash_lsh",
      // NOTE: measured both ways — an explicit persist() of the base is
      // 2.5× SLOWER here than recompute (columnar cache materialization
      // of 64 signature columns costs more than AQE's shuffle-stage
      // reuse saves); see Dedup.minHashDupPairsFromBase for when a
      // persisted base does pay off.
      (s, d) => Dedup.minHashDupPairs(documents(s, d), "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b"),
      // the whole pipeline — token hash, shingle hash, 64 affine
      // permutations, banding, Jaccard verify — is the portable md5-60
      // family, so the oracle replays candidate generation EXACTLY
      // (note: the 1000-doc bucket cap never binds at oracle scale)
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
              verified AS (
                SELECT c.id_a, c.id_b,
                  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
                FROM cand c
                JOIN sh a ON a.doc_id = c.id_a
                JOIN sh b ON b.doc_id = c.id_b)
              SELECT id_a, id_b, round(jaccard, 4) AS jaccard
              FROM verified WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""),
      headline = true),

    QueryDef("x28_minhash_estimate",
      // signature-estimated verification: same candidates as x03, but
      // scored by agreeing signature slots / k (the unbiased MinHash
      // Jaccard estimate) — at 100 TB the verify join ships k longs
      // per doc instead of the full shingle set. n/64 is binary-exact,
      // so the estimate needs no rounding to hash-match
      (s, d) => Dedup.minHashDupPairsEstimated(documents(s, d), "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy("id_a", "id_b"),
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
              est AS (
                SELECT c.id_a, c.id_b,
                  CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE)
                    / 64.0 AS est_jaccard
                FROM cand c
                JOIN mh a ON a.doc_id = c.id_a
                JOIN mh b ON b.doc_id = c.id_b AND b.i = a.i
                GROUP BY c.id_a, c.id_b)
              SELECT id_a, id_b, est_jaccard FROM est
              WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""")),

    QueryDef("x63_minhash_accuracy",
      // the fuzzy tier's accuracy monitor (x61/x62's MinHash sibling):
      // estimated vs exact Jaccard on the SAME candidate pairs, signed
      // error in floored integer ppm — the number that decides whether
      // the no-shingle-re-ship estimator (x28) is safe for a given
      // corpus, measured on its own candidate distribution instead of
      // the theoretical ±1/sqrt(k) bound
      (s, d) => Dedup.minHashAccuracyAudit(documents(s, d), "doc_id", "text",
          shingleN = 3, k = 64, bands = 16)
        .orderBy("id_a", "id_b"),
      // the x28 replay through candidate generation, then BOTH scores:
      // agreeing-slot count over the 64 signature mins, and exact
      // intersection/union over the distinct shingle sets
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
              est AS (
                SELECT c.id_a, c.id_b,
                  SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS slots
                FROM cand c
                JOIN mh a ON a.doc_id = c.id_a
                JOIN mh b ON b.doc_id = c.id_b AND b.i = a.i
                GROUP BY c.id_a, c.id_b),
              ex AS (
                SELECT c.id_a, c.id_b,
                  len(list_intersect(sa.hs, sb.hs)) AS inter,
                  len(sa.hs) + len(sb.hs)
                    - len(list_intersect(sa.hs, sb.hs)) AS uni
                FROM cand c
                JOIN sh sa ON sa.doc_id = c.id_a
                JOIN sh sb ON sb.doc_id = c.id_b)
              SELECT e.id_a, e.id_b,
                CAST((e.slots * 1000000) // 64 AS BIGINT) AS est_ppm,
                CAST((x.inter * 1000000) // x.uni AS BIGINT) AS exact_ppm,
                CAST((e.slots * 1000000) // 64
                  - (x.inter * 1000000) // x.uni AS BIGINT) AS err_ppm
              FROM est e JOIN ex x ON x.id_a = e.id_a AND x.id_b = e.id_b
              ORDER BY e.id_a, e.id_b""")),

    QueryDef("x65_token_budget",
      // per-source COST budget (the "take N tokens per source" mix
      // op; x38 caps documents, this caps a cost column): greedy
      // deterministic prefix in salted-draw order until the running
      // total would cross the budget. The engine runs the chunked
      // prefix-sum form (only the boundary bucket per source sorts);
      // the oracle replays the naive per-group window — passing at
      // all SFs proves the chunked path IS the naive semantics
      (s, d) => Sampling.tokenBudgetPerGroup(documents(s, d), "source",
          "doc_id", "n_chars", budget = 5000L, salt = "b1")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""WITH r AS (
                SELECT doc_id, source, n_chars,
                  CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':b1'), 1, 13) AS BIGINT) AS draw
                FROM documents),
              c AS (
                SELECT doc_id, source, n_chars,
                  sum(coalesce(n_chars, 0)) OVER (PARTITION BY source
                    ORDER BY draw, doc_id
                    ROWS UNBOUNDED PRECEDING) AS run
                FROM r)
              SELECT doc_id, source, n_chars FROM c
              WHERE run <= 5000 ORDER BY doc_id""")),

    QueryDef("x64_lsh_banding_recall",
      // the banding S-curve, measured: per 0.1-wide exact-Jaccard band
      // on a bounded doc sample, how many true pairs the LSH banding
      // actually surfaces. x63 audits the SCORING of surfaced pairs;
      // this audits which pairs surface at all — together they bound
      // the fuzzy tier's total loss. The sample (doc_id < 300) keeps
      // the ground-truth quadratic term test-sized; at scale the same
      // operator runs on a drawn sample of the same order
      (s, d) => Dedup.lshBandingRecall(
          documents(s, d).where(col("doc_id") < 300), "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, minJaccardPpm = 50000L)
        .orderBy("band_ppm"),
      // the x28 signing/banding replay restricted to the sample, plus
      // the all-pairs exact-Jaccard ground truth over the same shingle
      // sets, banded by floored integer division
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents WHERE doc_id < 300),
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
              truth AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST((len(list_intersect(a.hs, b.hs)) * 1000000)
                    // (len(a.hs) + len(b.hs)
                        - len(list_intersect(a.hs, b.hs))) AS BIGINT) AS jac_ppm
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
              lab AS (
                SELECT t.jac_ppm,
                  CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS caught
                FROM truth t LEFT JOIN cand c
                  ON c.id_a = t.id_a AND c.id_b = t.id_b
                WHERE t.jac_ppm >= 50000)
              SELECT CAST((jac_ppm // 100000) * 100000 AS BIGINT) AS band_ppm,
                count(*) AS n_pairs,
                CAST(sum(caught) AS BIGINT) AS n_caught,
                CAST((sum(caught) * 1000000) // count(*) AS BIGINT) AS catch_ppm
              FROM lab GROUP BY 1 ORDER BY band_ppm""")),

    QueryDef("x66_boilerplate_strip",
      // the C4 boilerplate rule's other half (x44 keeps a duplicated
      // chunk's FIRST occurrence; this strips EVERY occurrence of a
      // chunk living in more than maxDf distinct docs — licence
      // blocks and banners have no "first" copy worth keeping).
      // Distinct-doc frequency, not occurrence count: within-doc
      // repetition is style, not corpus boilerplate
      (s, d) => Dedup.stripFrequentChunks(documents(s, d), "doc_id", "text",
          chunkTokens = 3, maxDf = 2)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              st AS (
                SELECT doc_id, toks,
                  unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS ci
                FROM tk WHERE len(toks) > 0),
              ch AS (
                SELECT doc_id, ci AS chunk_idx,
                  array_to_string(list_slice(toks, CAST(ci * 3 + 1 AS INT),
                    CAST(least((ci + 1) * 3, len(toks)) AS INT)), ' ') AS chunk_text
                FROM st),
              fr AS (
                SELECT chunk_text FROM (
                  SELECT chunk_text, count(DISTINCT doc_id) AS dfreq
                  FROM ch GROUP BY chunk_text) t
                WHERE dfreq > 2)
              SELECT doc_id, count(*) AS n_chunks_kept,
                string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_stripped
              FROM ch
              WHERE chunk_text NOT IN (SELECT chunk_text FROM fr)
              GROUP BY doc_id ORDER BY doc_id""")),

    QueryDef("x04_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
          n = 1, threshold = 0.5, blockOn = Seq("lang", "source"))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              pairs AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                  CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
                  (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) AS jaccard
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
                WHERE len(l.sh) > 0 AND len(r.sh) > 0
                  AND len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) > 0)
              SELECT id_a, id_b, round(jaccard, 4) AS jaccard
              FROM pairs WHERE jaccard >= 0.5 ORDER BY id_a, id_b""")),

    QueryDef("x22_dup_clusters",
      // pairs -> connected components -> min-id cluster label (the
      // survivor); pairs come from the deterministic n-gram variant so
      // the oracle can recompute them with a recursive CTE
      (s, d) => Dedup.dupClusters(
          Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
            n = 1, threshold = 0.5, blockOn = Seq("lang", "source")))
        .orderBy("id"),
      Some("""WITH RECURSIVE toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              pairs AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
                WHERE len(l.sh) > 0 AND len(r.sh) > 0
                  AND len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) > 0
                  AND CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
                      (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 0.5),
              edges AS (SELECT id_a, id_b FROM pairs
                        UNION ALL SELECT id_b, id_a FROM pairs),
              reach AS (
                SELECT id_a AS id, id_a AS r FROM edges
                UNION
                SELECT re.id, e.id_b AS r FROM reach re JOIN edges e ON e.id_a = re.r)
              SELECT id, min(r) AS label FROM reach GROUP BY id ORDER BY id""")),

    QueryDef("x74_family_histogram",
      // the dup-family mass monitor: family sizes from the x22
      // components, bucketed by BIT LENGTH (exact integer log2 — a
      // double log2's ulp at exact powers could flip a bucket between
      // engines). log2-many rows at any corpus size; the fat-tail
      // smell that motivates the x66 strip and the x72 diversity cap
      (s, d) => Dedup.familySizeHistogram(
          Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
            n = 1, threshold = 0.5, blockOn = Seq("lang", "source")))
        .orderBy("size_bits"),
      Some("""WITH RECURSIVE toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              prs AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
                WHERE len(l.sh) > 0 AND len(r.sh) > 0
                  AND len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) > 0
                  AND CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
                      (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 0.5),
              edges AS (SELECT id_a, id_b FROM prs
                        UNION ALL SELECT id_b, id_a FROM prs),
              reach AS (
                SELECT id_a AS id, id_a AS r FROM edges
                UNION
                SELECT re.id, e.id_b AS r FROM reach re JOIN edges e ON e.id_a = re.r),
              lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
              fam AS (SELECT label, count(*) AS size FROM lbl GROUP BY label)
              SELECT CAST(length(bin(size)) AS BIGINT) AS size_bits,
                count(*) AS n_families,
                CAST(sum(size) AS BIGINT) AS n_docs
              FROM fam GROUP BY size_bits ORDER BY size_bits""")),

    QueryDef("x75_dsir_score",
      // DSIR importance scoring (Xie et al. 2023): hashed unigram+
      // bigram bag models for target (en docs) vs raw (everything),
      // per-doc log-likelihood ratio in integer micro-nats — the
      // per-bucket ln is rounded ONCE to a Long, the per-doc score is
      // then an exact integer sum (partition-order invariant; a
      // double sum would not hash-match across engines). Model is
      // bucket-bounded (1024 rows + a 1-row totals broadcast); the
      // only corpus-sized shuffle is the per-doc hash agg
      (s, d) => Sampling.dsirScores(documents(s, d),
          documents(s, d).where(col("lang") === "en"),
          "doc_id", "text", buckets = 1024, salt = "dsir")
        .select("doc_id", "lang", "source", "score_unats", "n_feats")
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
                SELECT doc_id, lang,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM documents),
              f AS (
                SELECT doc_id, lang, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM t),
              fb AS (
                SELECT doc_id, lang,
                  CAST('0x' || substring(md5('dsir:' || feat), 1, 15) AS BIGINT)
                    % 1024 AS bucket
                FROM f),
              tf AS (SELECT bucket, count(*) AS ct FROM fb
                     WHERE lang = 'en' GROUP BY 1),
              rf AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY 1),
              tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tf) AS tt,
                             (SELECT coalesce(sum(cr), 0) FROM rf) AS tr),
              model AS (
                SELECT coalesce(rf.bucket, tf.bucket) AS bucket,
                  CAST(round(1000000.0 * (ln(coalesce(ct, 0) + 1)
                    - ln(tt + 1024) - ln(coalesce(cr, 0) + 1)
                    + ln(tr + 1024))) AS BIGINT) AS lscore
                FROM rf FULL OUTER JOIN tf ON rf.bucket = tf.bucket
                CROSS JOIN tot),
              sc AS (
                SELECT fb.doc_id, CAST(sum(m.lscore) AS BIGINT) AS s,
                  count(*) AS nf
                FROM fb JOIN model m USING (bucket) GROUP BY 1)
              SELECT d.doc_id, d.lang, d.source,
                coalesce(sc.s, 0) AS score_unats,
                coalesce(sc.nf, 0) AS n_feats
              FROM documents d LEFT JOIN sc USING (doc_id)
              ORDER BY d.doc_id"""),
      headline = true),

    QueryDef("x76_dsir_select",
      // DSIR selection: Gumbel-top-k sampling without replacement
      // proportional to exp(score) — key = score_unats + the md5-drawn
      // Gumbel noise in micro-nats; top-k plans as
      // TakeOrderedAndProject (per-task k-bounded heap, never a
      // global sort). The selection is a pure function of the data —
      // the oracle replays noise and ranking exactly
      (s, d) => Sampling.dsirSelect(documents(s, d),
          documents(s, d).where(col("lang") === "en"),
          "doc_id", "text", k = 50, buckets = 1024, salt = "dsir")
        .select("doc_id", "lang", "source", "score_unats", "sel_key"),
      Some(s"""WITH t AS (
                SELECT doc_id, lang,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM documents),
              f AS (
                SELECT doc_id, lang, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM t),
              fb AS (
                SELECT doc_id, lang,
                  CAST('0x' || substring(md5('dsir:' || feat), 1, 15) AS BIGINT)
                    % 1024 AS bucket
                FROM f),
              tf AS (SELECT bucket, count(*) AS ct FROM fb
                     WHERE lang = 'en' GROUP BY 1),
              rf AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY 1),
              tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tf) AS tt,
                             (SELECT coalesce(sum(cr), 0) FROM rf) AS tr),
              model AS (
                SELECT coalesce(rf.bucket, tf.bucket) AS bucket,
                  CAST(round(1000000.0 * (ln(coalesce(ct, 0) + 1)
                    - ln(tt + 1024) - ln(coalesce(cr, 0) + 1)
                    + ln(tr + 1024))) AS BIGINT) AS lscore
                FROM rf FULL OUTER JOIN tf ON rf.bucket = tf.bucket
                CROSS JOIN tot),
              sc AS (
                SELECT fb.doc_id, CAST(sum(m.lscore) AS BIGINT) AS s,
                  count(*) AS nf
                FROM fb JOIN model m USING (bucket) GROUP BY 1),
              scored AS (
                SELECT d.doc_id, d.lang, d.source,
                  coalesce(sc.s, 0) AS score_unats,
                  coalesce(sc.s, 0) + CAST(round(-1000000.0 * ln(-ln(
                    (CAST('0x' || substring(md5('dsir:gumbel:'
                        || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                      % 1000000 + 0.5) / 1000000.0))) AS BIGINT) AS sel_key
                FROM documents d LEFT JOIN sc USING (doc_id))
              SELECT * FROM scored
              ORDER BY sel_key DESC, doc_id LIMIT 50""")),

    QueryDef("x77_dsir_grow",
      // the GROWING DSIR model: the raw bag-of-ngrams state arrives in
      // two batches (even/odd ids), merges by integer addition, and
      // the second batch is scored against the model built from the
      // GROWN state — the oracle computes the one-shot model over the
      // whole corpus, so a hash match proves grown == one-shot
      // bit-identically (the intake shape: maintaining the raw model
      // of a growing corpus costs one batch scan per arrival, never a
      // corpus re-scan)
      (s, d) => {
        val docs = documents(s, d)
        val batchA = docs.where(col("doc_id") % 2 === 0)
        val batchB = docs.where(col("doc_id") % 2 === 1)
        val rawState = Sampling.mergeDsirStates(Seq(
          Sampling.dsirState(batchA, "text", buckets = 1024, salt = "dsir"),
          Sampling.dsirState(batchB, "text", buckets = 1024, salt = "dsir")))
        val tgtState = Sampling.dsirState(
          docs.where(col("lang") === "en"), "text",
          buckets = 1024, salt = "dsir")
        val model = Sampling.dsirModelFromStates(rawState, tgtState, 1024)
        Sampling.dsirScoresAgainstModel(batchB, model, "doc_id", "text",
            buckets = 1024, salt = "dsir")
          .select("doc_id", "lang", "source", "score_unats", "n_feats")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, lang,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM documents),
              f AS (
                SELECT doc_id, lang, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM t),
              fb AS (
                SELECT doc_id, lang,
                  CAST('0x' || substring(md5('dsir:' || feat), 1, 15) AS BIGINT)
                    % 1024 AS bucket
                FROM f),
              tf AS (SELECT bucket, count(*) AS ct FROM fb
                     WHERE lang = 'en' GROUP BY 1),
              rf AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY 1),
              tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tf) AS tt,
                             (SELECT coalesce(sum(cr), 0) FROM rf) AS tr),
              model AS (
                SELECT coalesce(rf.bucket, tf.bucket) AS bucket,
                  CAST(round(1000000.0 * (ln(coalesce(ct, 0) + 1)
                    - ln(tt + 1024) - ln(coalesce(cr, 0) + 1)
                    + ln(tr + 1024))) AS BIGINT) AS lscore
                FROM rf FULL OUTER JOIN tf ON rf.bucket = tf.bucket
                CROSS JOIN tot),
              sc AS (
                SELECT fb.doc_id, CAST(sum(m.lscore) AS BIGINT) AS s,
                  count(*) AS nf
                FROM fb JOIN model m USING (bucket) GROUP BY 1)
              SELECT d.doc_id, d.lang, d.source,
                coalesce(sc.s, 0) AS score_unats,
                coalesce(sc.nf, 0) AS n_feats
              FROM documents d LEFT JOIN sc USING (doc_id)
              WHERE d.doc_id % 2 = 1
              ORDER BY d.doc_id""")),

    QueryDef("x68_best_dup_survivor",
      // canonical-VERSION selection (r8): per dup family keep the most
      // complete member (max n_chars, ties -> min id) instead of the
      // first-seen one — the batch re-curation rule for truncated web
      // captures. Families come from the same deterministic n-gram
      // pair relation as x22 so the oracle replays them with the
      // recursive CTE; every doc appears in exactly one family
      // (singleton label = own id)
      (s, d) => Dedup.bestSurvivorPerCluster(
          documents(s, d), "doc_id", "n_chars",
          Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
            n = 1, threshold = 0.5, blockOn = Seq("lang", "source")))
        .orderBy("label"),
      Some("""WITH RECURSIVE toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              pairs AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
                WHERE len(l.sh) > 0 AND len(r.sh) > 0
                  AND len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) > 0
                  AND CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
                      (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 0.5),
              edges AS (SELECT id_a, id_b FROM pairs
                        UNION ALL SELECT id_b, id_a FROM pairs),
              reach AS (
                SELECT id_a AS id, id_a AS r FROM edges
                UNION
                SELECT re.id, e.id_b AS r FROM reach re JOIN edges e ON e.id_a = re.r),
              lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
              mem AS (
                SELECT coalesce(l.label, d.doc_id) AS label, d.doc_id, d.n_chars
                FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              agg AS (
                SELECT label, max(n_chars) AS mx, count(*) AS n_members
                FROM mem GROUP BY label)
              SELECT a.label, min(m.doc_id) AS survivor_id, a.n_members
              FROM agg a JOIN mem m ON m.label = a.label AND m.n_chars = a.mx
              GROUP BY a.label, a.n_members ORDER BY a.label""")),

    QueryDef("x05_simhash",
      (s, d) => Dedup.simHashDupPairs(documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b"),
      // 60-bit portable fingerprints: the oracle rebuilds the per-bit
      // majority vote and the 15-bit quarter blocking exactly
      Some("""WITH h AS (
                SELECT doc_id,
                  CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) AS h
                FROM (SELECT doc_id, unnest(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS t
                  FROM documents)),
              votes AS (
                SELECT doc_id, b,
                  sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM h, range(0, 60) t(b) GROUP BY doc_id, b),
              fp AS (
                SELECT doc_id,
                  CAST(sum(CASE WHEN v > 0
                    THEN CAST(1 AS BIGINT) << CAST(b AS INT)
                    ELSE 0 END) AS BIGINT) AS fp
                FROM votes GROUP BY doc_id),
              blocks AS (
                SELECT doc_id, fp, q, (fp >> CAST(q * 15 AS INT)) & 32767 AS qk
                FROM fp, range(0, 4) t(q)),
              cand AS (
                SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                  l.fp AS fa, r.fp AS fb
                FROM blocks l JOIN blocks r
                  ON l.q = r.q AND l.qk = r.qk AND l.doc_id < r.doc_id)
              SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
              FROM cand WHERE bit_count(xor(fa, fb)) <= 3
              ORDER BY id_a, id_b""")),

    QueryDef("x19_contamination",
      // train/test contamination: the "test" slice (docs 0-99) checked
      // for verbatim presence in the full training corpus, matched on
      // the canonical fingerprint, not raw text. (This synthetic corpus
      // has no cross-doc duplicates, so the hits are the test docs'
      // own occurrences — exactly what a leakage audit flags.)
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("canon", TextAnalysis.normalizeText(col("text")))
        val test = docs.where(col("doc_id") < 100)
        Dedup.crossCorpusOverlap(test, "doc_id", docs, "doc_id", col("canon"))
          .select(col("left_id").as("test_id"), col("right_id").as("train_id"))
          .orderBy("test_id", "train_id")
      },
      Some("""WITH canon AS (
                SELECT doc_id,
                  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS dg
                FROM documents)
              SELECT l.doc_id AS test_id, r.doc_id AS train_id
              FROM canon l JOIN canon r ON l.dg = r.dg
              WHERE l.doc_id < 100
              ORDER BY test_id, train_id""")),

    QueryDef("x23_ngram_contamination",
      // GPT-3-style decontamination: a test doc is contaminated if any
      // 5-token shingle of it appears in a training doc; n_shared
      // counts the distinct shared shingles (evidence strength)
      (s, d) => {
        val docs = documents(s, d)
        Dedup.ngramContamination(docs.where(col("doc_id") < 50), "doc_id",
            docs, "doc_id", "text", n = 5)
          .orderBy("test_id", "train_id")
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
                  WHEN nt >= 5 THEN list_transform(range(1, nt - 3), i ->
                    CAST('0x' || substring(md5(
                      CAST(h[CAST(i AS INT)] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 1] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 2] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 3] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 4] AS VARCHAR)), 1, 15) AS BIGINT))
                  ELSE [CAST('0x' || substring(md5(
                      CAST(h[1] AS VARCHAR) || ',' ||
                      CAST(coalesce(h[2], -1) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[3], -2) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[4], -3) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[5], -4) AS VARCHAR)), 1, 15) AS BIGINT)]
                  END) AS hs
                FROM th),
              te AS (SELECT doc_id AS test_id, unnest(hs) AS s FROM sh WHERE doc_id < 50),
              tr AS (SELECT doc_id AS train_id, unnest(hs) AS s FROM sh)
              SELECT test_id, train_id, count(*) AS n_shared
              FROM te JOIN tr USING (s)
              WHERE test_id <> train_id
              GROUP BY 1, 2 ORDER BY test_id, train_id""")),

    QueryDef("x67_contamination_report",
      // the per-eval-item audit over x23's pair relation: for each
      // doc of a holdout slice, how many corpus docs share a 5-gram,
      // the worst containment (shared grams / the eval doc's own
      // grams, floored ppm) and which corpus doc it is — the
      // ship/no-ship call on an eval suite, item by item. Clean items
      // surface as zero rows, not missing rows
      (s, d) => {
        val docs = documents(s, d)
        Dedup.contaminationReport(
            docs.where(col("doc_id") % 97 =!= 0), "doc_id", "text",
            docs.where(col("doc_id") % 97 === 0), "doc_id", "text", n = 5)
          .orderBy("eval_id")
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
                  WHEN nt >= 5 THEN list_transform(range(1, nt - 3), i ->
                    CAST('0x' || substring(md5(
                      CAST(h[CAST(i AS INT)] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 1] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 2] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 3] AS VARCHAR) || ',' ||
                      CAST(h[CAST(i AS INT) + 4] AS VARCHAR)), 1, 15) AS BIGINT))
                  ELSE [CAST('0x' || substring(md5(
                      CAST(h[1] AS VARCHAR) || ',' ||
                      CAST(coalesce(h[2], -1) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[3], -2) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[4], -3) AS VARCHAR) || ',' ||
                      CAST(coalesce(h[5], -4) AS VARCHAR)), 1, 15) AS BIGINT)]
                  END) AS hs
                FROM th),
              te AS (SELECT doc_id AS test_id, unnest(hs) AS s FROM sh
                     WHERE doc_id % 97 = 0),
              tr AS (SELECT doc_id AS train_id, unnest(hs) AS s FROM sh
                     WHERE doc_id % 97 <> 0),
              ov AS (
                SELECT test_id, train_id, count(*) AS n_shared
                FROM te JOIN tr USING (s)
                WHERE test_id <> train_id
                GROUP BY 1, 2),
              ag AS (
                SELECT eval_id, n_hit_docs, worst_shared, worst_doc FROM (
                  SELECT test_id AS eval_id, train_id AS worst_doc,
                    n_shared AS worst_shared,
                    count(*) OVER (PARTITION BY test_id) AS n_hit_docs,
                    row_number() OVER (PARTITION BY test_id
                      ORDER BY n_shared DESC, train_id) AS rn
                  FROM ov) t WHERE rn = 1),
              ng AS (SELECT doc_id AS eval_id, len(hs) AS n_grams FROM sh
                     WHERE doc_id % 97 = 0)
              SELECT ng.eval_id, CAST(ng.n_grams AS BIGINT) AS n_grams,
                CAST(coalesce(ag.n_hit_docs, 0) AS BIGINT) AS n_hit_docs,
                CAST((coalesce(ag.worst_shared, 0) * 1000000)
                  // ng.n_grams AS BIGINT) AS worst_ppm,
                ag.worst_doc
              FROM ng LEFT JOIN ag USING (eval_id)
              ORDER BY ng.eval_id""")),

    QueryDef("x20_incremental_dedup",
      // incremental ingest: docs >= 250 arrive after docs < 250; keep
      // only arrivals whose content digest is genuinely new
      (s, d) => {
        val docs = documents(s, d)
        val existing = docs.where(col("doc_id") < 250)
        val incoming = docs.where(col("doc_id") >= 250)
        Dedup.incrementalSurvivors(existing, incoming, col("text"))
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source FROM documents i
              WHERE doc_id >= 250 AND NOT EXISTS (
                SELECT 1 FROM documents e
                WHERE e.doc_id < 250 AND md5(e.text) = md5(i.text))
              ORDER BY doc_id""")),

    QueryDef("x41_fuzzy_index_dedup",
      // incremental FUZZY dedup against a PERSISTED signature index:
      // the corpus (docs < 250) is signed and banded once into a
      // shard-partitioned lake index; the incoming batch (>= 250) is
      // signed map-side and PROBES it — band-bucket candidates, exact
      // Jaccard verify, survivors keep only batch docs with no
      // near-dup in the corpus. The probe reads corpus shards its own
      // buckets hash to (static partition filters), never the text.
      (s, d) => {
        val docs = documents(s, d)
        val corpus = docs.where(col("doc_id") < 250)
        val incoming = docs.where(col("doc_id") >= 250)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_fuzzy_idx_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildFuzzyIndex(corpus, "doc_id", "text", path,
          shingleN = 3, k = 64, bands = 16)
        Dedup.incrementalFuzzySurvivors(s, path, incoming, "doc_id", "text",
            threshold = 0.5)
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      // the oracle replays the full portable pipeline (token md5-60,
      // shingle hash, 64 affine permutations, 16 bands) exactly as in
      // x03, restricted to corpus-side < 250 / batch-side >= 250
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
                SELECT DISTINCT b.doc_id AS in_id, c.doc_id AS corpus_id
                FROM bands b JOIN bands c ON b.bucket = c.bucket
                WHERE b.doc_id >= 250 AND c.doc_id < 250),
              dup AS (
                SELECT DISTINCT p.in_id
                FROM cand p
                JOIN sh a ON a.doc_id = p.in_id
                JOIN sh b ON b.doc_id = p.corpus_id
                WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                  >= 0.5)
              SELECT doc_id, source FROM documents
              WHERE doc_id >= 250
                AND doc_id NOT IN (SELECT in_id FROM dup)
              ORDER BY doc_id""")),

    QueryDef("x46_grow_intake",
      // x41 with the index GROWING (r7): two batches arrive in
      // sequence; each runs one intakeStepAgainstFuzzyIndex —
      // within-batch cluster dedup (min-id survivor per component),
      // corpus probe, and APPEND of the accepted docs into the
      // persisted index — so batch-2 docs duplicating an ACCEPTED
      // batch-1 doc are dropped even though neither was in the build
      // corpus. buildFuzzyIndex overwrites, so re-runs reset the
      // index before growing it again (deterministic at any SF).
      (s, d) => {
        val docs = documents(s, d)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_grow_idx_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildFuzzyIndex(docs.where(col("doc_id") < 250),
          "doc_id", "text", path, shingleN = 3, k = 64, bands = 16)
        val s1 = Dedup.intakeStepAgainstFuzzyIndex(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", "text", threshold = 0.5)
        val s2 = Dedup.intakeStepAgainstFuzzyIndex(s, path,
          docs.where(col("doc_id") >= 400),
          "doc_id", "text", threshold = 0.5)
        s1.select("doc_id", "source")
          .unionByName(s2.select("doc_id", "source"))
          .orderBy("doc_id")
      },
      // the oracle replays the x41 portable MinHash pipeline for the
      // DUP-PAIR relation (band candidates + exact Jaccard), then the
      // sequential first-wins algebra on top: batch-1 keeps min-id
      // component survivors (the x22 recursive-CTE pattern) with no
      // corpus dup; batch-2 additionally drops dups of batch-1's
      // ACCEPTED docs — the grown-index semantics
      Some("""WITH RECURSIVE tk AS (
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
                SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
                FROM bands b JOIN bands c
                  ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
              pairs AS (
                SELECT p.id_a, p.id_b FROM cand p
                JOIN sh a ON a.doc_id = p.id_a
                JOIN sh b ON b.doc_id = p.id_b
                WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                  >= 0.5),
              e1 AS (
                SELECT id_a, id_b FROM pairs
                WHERE id_a >= 250 AND id_a < 400 AND id_b >= 250 AND id_b < 400
                UNION ALL
                SELECT id_b, id_a FROM pairs
                WHERE id_a >= 250 AND id_a < 400 AND id_b >= 250 AND id_b < 400),
              r1 AS (
                SELECT id_a AS id, id_a AS r FROM e1
                UNION
                SELECT re.id, e.id_b AS r FROM r1 re JOIN e1 e ON e.id_a = re.r),
              a1 AS (
                SELECT doc_id FROM documents
                WHERE doc_id >= 250 AND doc_id < 400
                  AND doc_id NOT IN
                    (SELECT id FROM r1 GROUP BY id HAVING min(r) < id)
                  AND doc_id NOT IN
                    (SELECT id_b FROM pairs WHERE id_a < 250)),
              e2 AS (
                SELECT id_a, id_b FROM pairs
                WHERE id_a >= 400 AND id_b >= 400
                UNION ALL
                SELECT id_b, id_a FROM pairs
                WHERE id_a >= 400 AND id_b >= 400),
              r2 AS (
                SELECT id_a AS id, id_a AS r FROM e2
                UNION
                SELECT re.id, e.id_b AS r FROM r2 re JOIN e2 e ON e.id_a = re.r),
              a2 AS (
                SELECT doc_id FROM documents
                WHERE doc_id >= 400
                  AND doc_id NOT IN
                    (SELECT id FROM r2 GROUP BY id HAVING min(r) < id)
                  AND doc_id NOT IN
                    (SELECT id_b FROM pairs WHERE id_a < 250)
                  AND doc_id NOT IN
                    (SELECT p.id_b FROM pairs p
                     JOIN a1 ON p.id_a = a1.doc_id))
              SELECT doc_id, source FROM documents
              WHERE doc_id IN (SELECT doc_id FROM a1
                               UNION ALL SELECT doc_id FROM a2)
              ORDER BY doc_id""")),

    QueryDef("x50_exact_grow_intake",
      // the EXACT-tier growing index (x46's cheap sibling): digests
      // persisted shard-partitioned; each batch dedups within itself
      // (lowest id per digest), probes only the shards its own
      // digests hash to, and appends its accepted rows — so an exact
      // copy arriving batches later is dropped without the corpus
      // digest set ever being recomputed or fully read
      (s, d) => {
        val docs = documents(s, d)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_exact_idx_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildExactIndex(docs.where(col("doc_id") < 250),
          "doc_id", col("text"), path)
        val s1 = Dedup.intakeStepAgainstExactIndex(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", col("text"))
        val s2 = Dedup.intakeStepAgainstExactIndex(s, path,
          docs.where(col("doc_id") >= 400), "doc_id", col("text"))
        s1.select("doc_id", "source")
          .unionByName(s2.select("doc_id", "source"))
          .orderBy("doc_id")
      },
      // sequential first-wins on md5 equality: batch-1 keeps min-id
      // per digest with no corpus twin; batch-2 additionally drops
      // digests batch-1 accepted (the grown-index semantics)
      Some("""WITH dg AS (
                SELECT doc_id, source, md5(text) AS fp FROM documents),
              a1 AS (
                SELECT doc_id FROM dg d
                WHERE doc_id >= 250 AND doc_id < 400
                  AND doc_id = (SELECT min(x.doc_id) FROM dg x
                    WHERE x.fp = d.fp AND x.doc_id >= 250 AND x.doc_id < 400)
                  AND NOT EXISTS (SELECT 1 FROM dg c
                    WHERE c.doc_id < 250 AND c.fp = d.fp)),
              a2 AS (
                SELECT doc_id FROM dg d
                WHERE doc_id >= 400
                  AND doc_id = (SELECT min(x.doc_id) FROM dg x
                    WHERE x.fp = d.fp AND x.doc_id >= 400)
                  AND NOT EXISTS (SELECT 1 FROM dg c
                    WHERE c.doc_id < 250 AND c.fp = d.fp)
                  AND NOT EXISTS (SELECT 1 FROM dg b
                    JOIN a1 ON a1.doc_id = b.doc_id WHERE b.fp = d.fp))
              SELECT doc_id, source FROM documents
              WHERE doc_id IN (SELECT doc_id FROM a1
                               UNION ALL SELECT doc_id FROM a2)
              ORDER BY doc_id""")),

    QueryDef("x52_curate_intake",
      // the INCREMENTAL curation funnel (r8): two batches flow
      // clean/filter → growing exact-digest tier → growing fuzzy-
      // signature tier, each tier probed then appended, batch 1
      // bootstrapping both indexes from its own survivors — the
      // batch-at-a-time replay of Curate.curate whose sequential ==
      // one-shot algebra StreamingSpec pins in-engine. Index dirs are
      // cleared up front so every run bootstraps deterministically.
      // Config: en|und allowlist, default quality/token thresholds,
      // maxRepetition 1.0 (the repetition stage is a tautology here —
      // independently oracled in x24), threshold 0.5 for pair volume.
      (s, d) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_curate_idx_" +
          Integer.toHexString(d.hashCode)
        val conf = s.sparkContext.hadoopConfiguration
        Seq(s"$base/exact", s"$base/fuzzy").foreach { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).delete(hp, true)
        }
        val cfg = Curate.Config(langs = Seq("en", "und"),
          maxRepetition = 1.0, jaccardThreshold = 0.5, keep = Seq("source"))
        val s1 = Curate.intakeStep(s, documents(s, d).where(col("doc_id") < 300),
          "doc_id", "text", s"$base/exact", s"$base/fuzzy", cfg)
        val s2 = Curate.intakeStep(s, documents(s, d).where(col("doc_id") >= 300),
          "doc_id", "text", s"$base/exact", s"$base/fuzzy", cfg)
        val sel = Seq(col("doc_id"),
          substring(col("text"), 1, 60).as("text_head"), col("lang_id"),
          (floor(col("quality") * 10000) / 10000).as("quality"),
          col("n_tokens"), col("source"))
        s1.select(sel: _*).unionByName(s2.select(sel: _*)).orderBy("doc_id")
      },
      Some(curateIntakeOracle)),

    QueryDef("x53_exact_takedown",
      // retention/takedown on the EXACT tier (r8): docs 100-149 are
      // DELETED from the digest index after the build, so a later
      // batch's copies of them are ADMITTED again while copies of the
      // still-indexed corpus keep dropping — the licensing obligation
      // a frozen dedup index cannot honor. Build overwrites, so every
      // run replays build → delete → intake deterministically.
      (s, d) => {
        val docs = documents(s, d)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_takedown_ex_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildExactIndex(docs.where(col("doc_id") < 250),
          "doc_id", col("text"), path)
        Dedup.deleteFromExactIndex(s, path,
          docs.where(col("doc_id") >= 100 && col("doc_id") < 150),
          "doc_id", col("text"))
        Dedup.intakeStepAgainstExactIndex(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", col("text"))
          .select("doc_id", "source").orderBy("doc_id")
      },
      // oracle: within-batch first-wins on md5(text), then drop only
      // digests still LIVE in the index (corpus minus the deletion)
      Some("""WITH dg AS (
                SELECT doc_id, source, md5(text) AS fp FROM documents),
              live AS (
                SELECT fp FROM dg
                WHERE doc_id < 100 OR (doc_id >= 150 AND doc_id < 250)),
              a1 AS (
                SELECT doc_id FROM dg d
                WHERE doc_id >= 250 AND doc_id < 400
                  AND doc_id = (SELECT min(x.doc_id) FROM dg x
                                WHERE x.fp = d.fp
                                  AND x.doc_id >= 250 AND x.doc_id < 400)
                  AND fp NOT IN (SELECT fp FROM live))
              SELECT doc_id, source FROM documents
              WHERE doc_id IN (SELECT doc_id FROM a1)
              ORDER BY doc_id""")),

    QueryDef("x54_fuzzy_takedown",
      // retention/takedown on the FUZZY tier (r8): after deleting docs
      // 100-149 from the signature index, a batch is probed — near-
      // copies of deleted docs are ADMITTED (their band rows and
      // signatures are gone), near-copies of still-indexed docs drop.
      // deleteFromFuzzyIndex needs only the ids: the doomed buckets
      // re-derive from the ids' own stored signatures.
      (s, d) => {
        val docs = documents(s, d)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_takedown_fz_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildFuzzyIndex(docs.where(col("doc_id") < 250),
          "doc_id", "text", path, shingleN = 3, k = 64, bands = 16)
        Dedup.deleteFromFuzzyIndex(s, path,
          docs.where(col("doc_id") >= 100 && col("doc_id") < 150)
            .select("doc_id"), "doc_id")
        Dedup.incrementalFuzzySurvivors(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", "text", threshold = 0.5)
          .select("doc_id", "source").orderBy("doc_id")
      },
      // the x46 MinHash replay (band candidates + exact Jaccard), with
      // the corpus side restricted to the LIVE ids — batch docs
      // survive iff they have no >= 0.5 pair into the post-delete index
      Some("""WITH RECURSIVE tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents
                WHERE doc_id < 100 OR (doc_id >= 150 AND doc_id < 400)),
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
                SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
                FROM bands b JOIN bands c
                  ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
              prs AS (
                SELECT p.id_a, p.id_b FROM cand p
                JOIN sh a ON a.doc_id = p.id_a
                JOIN sh b ON b.doc_id = p.id_b
                WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                  >= 0.5),
              dropped AS (
                SELECT id_b AS doc_id FROM prs
                WHERE id_a < 250 AND id_b >= 250 AND id_b < 400
                UNION
                SELECT id_a FROM prs
                WHERE id_b < 250 AND id_a >= 250 AND id_a < 400)
              SELECT doc_id, source FROM documents
              WHERE doc_id >= 250 AND doc_id < 400
                AND doc_id NOT IN (SELECT doc_id FROM dropped)
              ORDER BY doc_id""")),

    QueryDef("x51_jsonl_roundtrip",
      // the interchange boundary: write the corpus as JSON-Lines (the
      // format training data actually ships in), read it back under
      // an EXPLICIT schema (inference is an extra full pass and
      // type-lossy), and prove row-level fidelity against the
      // original parquet — longs, full-escaped strings and nulls
      // round-trip exactly (the float/timestamp/binary caveats live
      // on graft.sources.Jsonl)
      (s, d) => {
        val docs = documents(s, d)
          .select("doc_id", "text", "lang", "source", "n_chars")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_" +
          Integer.toHexString(d.hashCode)
        graft.sources.Jsonl.write(docs, path)
        graft.sources.Jsonl.read(s, path, docs.schema)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, text, lang, source, n_chars
              FROM documents ORDER BY doc_id""")),

    QueryDef("x47_hash_split",
      // deterministic train/val/test assignment: salted md5 draw on
      // the id vs cumulative floored ppm thresholds — a map-only pure
      // row function, so the split survives reruns, repartitions and
      // corpus growth (existing rows never move); different salts
      // give independent splits (k-fold)
      (s, d) => Sampling.hashSplit(documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CASE
                WHEN CAST('0x' || substring(
                    md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                  % 1000000 < 800000 THEN 'train'
                WHEN CAST('0x' || substring(
                    md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                  % 1000000 < 900000 THEN 'val'
                ELSE 'test' END AS split
              FROM documents ORDER BY doc_id""")),

    QueryDef("x48_leaksafe_split",
      // LEAK-SAFE split: the draw keys on the document's dup-CLUSTER
      // representative (connected components over the deterministic
      // n-gram pair relation, min id; singletons on themselves), so a
      // near-dup family can never straddle train and test — the
      // train-on-it-eval-on-its-copy contamination a plain hash split
      // allows. Pairs from the x22 generator keep the oracle able to
      // replay components with a recursive CTE.
      (s, d) => {
        val docs = documents(s, d)
        Sampling.leakSafeSplit(docs, "doc_id",
            Dedup.ngramJaccardPairs(docs, "doc_id", "text",
              n = 1, threshold = 0.5, blockOn = Seq("lang", "source")),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select("doc_id", "split")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              prs AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
                WHERE len(l.sh) > 0 AND len(r.sh) > 0
                  AND len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) > 0
                  AND CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
                      (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 0.5),
              edges AS (SELECT id_a, id_b FROM prs
                        UNION ALL SELECT id_b, id_a FROM prs),
              reach AS (
                SELECT id_a AS id, id_a AS r FROM edges
                UNION
                SELECT re.id, e.id_b AS r FROM reach re JOIN edges e ON e.id_a = re.r),
              lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
              rep AS (
                SELECT d.doc_id, coalesce(l.label, d.doc_id) AS rep
                FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
              dr AS (
                SELECT doc_id,
                  CAST('0x' || substring(
                    md5('split:' || CAST(rep AS VARCHAR)), 1, 15) AS BIGINT)
                  % 1000000 AS draw
                FROM rep)
              SELECT doc_id, CASE
                WHEN draw < 800000 THEN 'train'
                WHEN draw < 900000 THEN 'val'
                ELSE 'test' END AS split
              FROM dr ORDER BY doc_id""")),

    QueryDef("x49_corpus_profile",
      // the per-source audit report card: doc count, token volume,
      // quality quartiles + exact-decimal mean, char envelope — one
      // DocStats scan, one hash aggregate. Determinism: 4dp-floored
      // per-doc quality, DECIMAL sum for the mean (double summation
      // is shuffle-order dependent), exact percentile interpolation
      // (quantile_cont replays it — the x45 precedent)
      (s, d) => TextAnalysis.corpusProfile(documents(s, d),
          "source", "text", "n_chars")
        .orderBy("source"),
      Some("""WITH t AS (
                SELECT doc_id, source, n_chars,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') AS toks, text
                FROM documents),
              f AS (
                SELECT doc_id, source, n_chars,
                  len(toks) AS n_tok,
                  CAST(len(toks) AS DOUBLE) AS n_tok_d,
                  CASE WHEN len(toks) > 0 THEN
                    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS avg_len,
                  CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9\s]')) AS DOUBLE)
                      / length(text)
                  ELSE 1.0 END AS punct,
                  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','ich','mit','von')))
                     + len(list_filter(toks, x -> x IN ('the','and','is','of','to','in','that','it','was','for')))
                     + len(list_filter(toks, x -> x IN ('el','la','los','las','es','y','en','que','por','una')))
                     + len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))
                     + len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','就','不','人'))) AS DOUBLE) AS stops
                FROM t),
              q AS (
                SELECT source, n_chars, n_tok, floor((
                    least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
                  + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
                  + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
                  + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) * 10000) / 10000 AS ql
                FROM f)
              SELECT source,
                count(*) AS n_docs,
                CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS total_tokens,
                floor(CAST(sum(CAST(ql AS DECIMAL(18,4))) AS DOUBLE)
                  / count(ql) * 10000) / 10000 AS avg_quality,
                floor(quantile_cont(ql, 0.25) * 10000) / 10000 AS q25_quality,
                floor(quantile_cont(ql, 0.5) * 10000) / 10000 AS q50_quality,
                floor(quantile_cont(ql, 0.75) * 10000) / 10000 AS q75_quality,
                min(n_chars) AS min_chars,
                max(n_chars) AS max_chars
              FROM q GROUP BY source ORDER BY source""")),

    QueryDef("x69_profile_merge",
      // the GROWING corpus profile (r8): three intake batches each
      // contribute a model-sized mergeable state (one DocStats scan of
      // the batch alone — counts, integer token sum, DECIMAL quality
      // sum, char envelope), states merge associatively, and the final
      // report is read out of the merged state. The oracle computes the
      // SAME report one-shot over the whole corpus — hash equality IS
      // the grown-== -one-shot proof (quartiles are deliberately
      // absent: exact percentiles don't merge; x49 covers them for the
      // one-shot path)
      (s, d) => {
        val docs = documents(s, d)
        val batches = Seq(
          docs.where(col("doc_id") < 200),
          docs.where(col("doc_id") >= 200 && col("doc_id") < 350),
          docs.where(col("doc_id") >= 350))
        val states = batches.map(
          TextAnalysis.profileState(_, "source", "text", "n_chars"))
        val grown = states.tail.foldLeft(states.head)((acc, s2) =>
          TextAnalysis.mergeProfileStates("source", Seq(acc, s2)))
        TextAnalysis.profileFromState(grown, "source").orderBy("source")
      },
      Some("""WITH t AS (
                SELECT doc_id, source, n_chars,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') AS toks, text
                FROM documents),
              f AS (
                SELECT doc_id, source, n_chars,
                  len(toks) AS n_tok,
                  CAST(len(toks) AS DOUBLE) AS n_tok_d,
                  CASE WHEN len(toks) > 0 THEN
                    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS avg_len,
                  CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9\s]')) AS DOUBLE)
                      / length(text)
                  ELSE 1.0 END AS punct,
                  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','ich','mit','von')))
                     + len(list_filter(toks, x -> x IN ('the','and','is','of','to','in','that','it','was','for')))
                     + len(list_filter(toks, x -> x IN ('el','la','los','las','es','y','en','que','por','una')))
                     + len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))
                     + len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','就','不','人'))) AS DOUBLE) AS stops
                FROM t),
              q AS (
                SELECT source, n_chars, n_tok, floor((
                    least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
                  + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
                  + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
                  + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) * 10000) / 10000 AS ql
                FROM f)
              SELECT source,
                count(*) AS n_docs,
                CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS total_tokens,
                floor(CAST(sum(CAST(ql AS DECIMAL(18,4))) AS DOUBLE)
                  / count(ql) * 10000) / 10000 AS avg_quality,
                min(n_chars) AS min_chars,
                max(n_chars) AS max_chars
              FROM q GROUP BY source ORDER BY source""")),

    QueryDef("x70_hist_quantiles",
      // the MERGEABLE quantile estimate (r8): x69's growing profile
      // deliberately omits quartiles (exact percentiles don't merge);
      // this closes that gap with a fixed-bin histogram state — three
      // intake batches each contribute (source, bin, count) rows, the
      // integer counts merge by addition, and q25/q50/q75 ESTIMATES
      // (lower edge of the first bin reaching the nearest-rank
      // position; within 1/64 of exact by construction) read out of
      // the merged state. The oracle bins one-shot over the whole
      // corpus — hash equality proves grown == one-shot AND pins the
      // estimator algebra. Determinism: power-of-two bins make every
      // edge an exact dyadic double; p ∈ {0.25,0.5,0.75} are exact
      // binary fractions, so ceil(p·n) is engine-portable
      (s, d) => {
        val docs = documents(s, d)
        val batches = Seq(
          docs.where(col("doc_id") < 200),
          docs.where(col("doc_id") >= 200 && col("doc_id") < 350),
          docs.where(col("doc_id") >= 350))
        val states = batches.map(
          TextAnalysis.profileHistState(_, "source", "text", bins = 64))
        val grown = states.tail.foldLeft(states.head)((acc, st) =>
          TextAnalysis.mergeHistStates("source", Seq(acc, st)))
        TextAnalysis.histQuantiles(grown, "source", bins = 64,
            ps = Seq(0.25, 0.5, 0.75))
          .orderBy("source", "p")
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') AS toks, text
                FROM documents),
              f AS (
                SELECT doc_id, source,
                  CAST(len(toks) AS DOUBLE) AS n_tok_d,
                  CASE WHEN len(toks) > 0 THEN
                    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS avg_len,
                  CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9\s]')) AS DOUBLE)
                      / length(text)
                  ELSE 1.0 END AS punct,
                  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','ich','mit','von')))
                     + len(list_filter(toks, x -> x IN ('the','and','is','of','to','in','that','it','was','for')))
                     + len(list_filter(toks, x -> x IN ('el','la','los','las','es','y','en','que','por','una')))
                     + len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))
                     + len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','就','不','人'))) AS DOUBLE) AS stops
                FROM t),
              q AS (
                SELECT source, floor((
                    least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
                  + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
                  + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
                  + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) * 10000) / 10000 AS ql
                FROM f),
              b AS (
                SELECT source, CAST(least(floor(ql * 64), 63) AS BIGINT) AS bin,
                  count(*) AS n
                FROM q WHERE ql IS NOT NULL GROUP BY source, bin),
              c AS (
                SELECT source, bin,
                  sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
                  sum(n) OVER (PARTITION BY source) AS total
                FROM b),
              ps AS (
                SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                               CAST(0.75 AS DOUBLE)]) AS p)
              SELECT source, p, CAST(min(bin) AS DOUBLE) / 64 AS q_est
              FROM c JOIN ps ON cum >= ceil(p * total)
              GROUP BY source, p ORDER BY source, p""")),

    QueryDef("x71_profile_drift",
      // the DRIFT MONITOR (r8): total-variation distance between two
      // quality-histogram snapshots per source — the signal that a
      // source's incoming quality DISTRIBUTION shifted (a mean can't
      // see variance or bimodality moves). Snapshot B drops src19
      // entirely, exercising the group-on-one-side branch (tv = 1.0,
      // complete drift). Work is a join of two model-sized states.
      // Determinism: the L1 numerator sums EXACT integers
      // |n_a·t_b − n_b·t_a| as DECIMAL(38,0) over the common
      // denominator (a double Σ of ratios would be shuffle-order
      // dependent — the x49 lesson), divided once at the end
      (s, d) => {
        val docs = documents(s, d)
        val histA = TextAnalysis.profileHistState(
          docs.where(col("doc_id") < 300), "source", "text", bins = 64)
        val histB = TextAnalysis.profileHistState(
          docs.where(col("doc_id") >= 300 && col("source") =!= "src19"),
          "source", "text", bins = 64)
        TextAnalysis.profileHistDrift(histA, histB, "source")
          .orderBy("source")
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') AS toks, text
                FROM documents),
              f AS (
                SELECT doc_id, source,
                  CAST(len(toks) AS DOUBLE) AS n_tok_d,
                  CASE WHEN len(toks) > 0 THEN
                    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS avg_len,
                  CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9\s]')) AS DOUBLE)
                      / length(text)
                  ELSE 1.0 END AS punct,
                  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','ich','mit','von')))
                     + len(list_filter(toks, x -> x IN ('the','and','is','of','to','in','that','it','was','for')))
                     + len(list_filter(toks, x -> x IN ('el','la','los','las','es','y','en','que','por','una')))
                     + len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))
                     + len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','就','不','人'))) AS DOUBLE) AS stops
                FROM t),
              q AS (
                SELECT doc_id, source, floor((
                    least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
                  + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
                  + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
                  + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) * 10000) / 10000 AS ql
                FROM f),
              ba AS (
                SELECT source, CAST(least(floor(ql * 64), 63) AS BIGINT) AS bin,
                  count(*) AS n
                FROM q WHERE doc_id < 300 AND ql IS NOT NULL GROUP BY source, bin),
              bb AS (
                SELECT source, CAST(least(floor(ql * 64), 63) AS BIGINT) AS bin,
                  count(*) AS n
                FROM q WHERE doc_id >= 300 AND source <> 'src19' AND ql IS NOT NULL
                GROUP BY source, bin),
              tta AS (SELECT source, sum(n) AS t FROM ba GROUP BY source),
              ttb AS (SELECT source, sum(n) AS t FROM bb GROUP BY source),
              j AS (
                SELECT coalesce(ba.source, bb.source) AS source,
                  coalesce(ba.n, 0) AS na, coalesce(bb.n, 0) AS nb
                FROM ba FULL OUTER JOIN bb
                  ON ba.source = bb.source AND ba.bin = bb.bin),
              agg AS (
                SELECT j.source, sum(na) AS n_a, sum(nb) AS n_b,
                  max(tta.t) AS ta, max(ttb.t) AS tb,
                  sum(abs(CAST(na AS DECIMAL(19,0)) * CAST(coalesce(ttb.t, 0) AS DECIMAL(19,0))
                        - CAST(nb AS DECIMAL(19,0)) * CAST(coalesce(tta.t, 0) AS DECIMAL(19,0)))) AS l1
                FROM j LEFT JOIN tta ON tta.source = j.source
                       LEFT JOIN ttb ON ttb.source = j.source
                GROUP BY j.source)
              SELECT source, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                CASE WHEN ta IS NULL OR tb IS NULL THEN 1.0
                ELSE floor(CAST(l1 AS DOUBLE)
                  / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) * 2.0) * 1e6) / 1e6 END AS tv
              FROM agg ORDER BY source""")),

    // ================================================= extensions: similarity
    QueryDef("x06_knn_cosine",
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", "q_id", "q_vec", k = 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH sims AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_sum(list_transform(list_zip(q.embedding, c.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                  (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                   sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
                FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
              ranked AS (
                SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims)
              SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
              FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""),
      headline = true),

    QueryDef("x07_ann_bucketed",
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.bucketedTopK(emb, queries, "vec_id", "embedding", "q_id", "q_vec",
            dim = 64, k = 5, planes = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "rank")
      },
      // still approximate in RECALL, but fully deterministic: integer
      // hyperplane projections (see Similarity.hyperplaneBucket) let
      // the oracle replay bucketing bit-for-bit
      Some(s"""WITH b AS (
                SELECT vec_id, embedding,
                  ${bucketSql("embedding", 4)} AS bucket
                FROM embeddings),
              sims AS (
                SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
                  ${cosineSql("qq.embedding", "cc.embedding")} AS cosine
                FROM b qq JOIN b cc
                  ON qq.bucket = cc.bucket AND qq.vec_id < 20
                  AND cc.vec_id <> qq.vec_id),
              ranked AS (
                SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims)
              SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
              FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("x25_multiprobe_ann",
      // same index as x07, but each query also probes the `planes`
      // buckets one bit-flip away — the standard LSH recall fix; the
      // oracle replays the probe set as integer XORs
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.multiProbeTopK(emb, queries, "vec_id", "embedding", "q_id", "q_vec",
            dim = 64, k = 5, planes = 4, probeHamming = 1)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH b AS (
                SELECT vec_id, embedding,
                  ${bucketSql("embedding", 4)} AS bucket
                FROM embeddings),
              probes AS (
                SELECT vec_id, embedding, unnest(
                  [bucket, xor(bucket, 1), xor(bucket, 2),
                   xor(bucket, 4), xor(bucket, 8)]) AS bucket
                FROM b WHERE vec_id < 20),
              sims AS (
                SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
                  ${cosineSql("qq.embedding", "cc.embedding")} AS cosine
                FROM probes qq JOIN b cc
                  ON qq.bucket = cc.bucket AND cc.vec_id <> qq.vec_id),
              ranked AS (
                SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims)
              SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
              FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("x26_int8_quant",
      // symmetric per-vector int8 quantization (the 4x memory lever
      // for embedding indexes): scale = max|x|/127, q = clamp(half-up)
      // — all IEEE-deterministic algebra, so the oracle replays the
      // full quantized vector (pinned via the exact integer self-dot)
      // and the scale (pinned via floor-truncation at 1e-9, not
      // round() — tie behavior differs across engines)
      (s, d) => {
        val z = embeddings(s, d)
          .select(col("vec_id"), Similarity.int8Quantize(col("embedding")).as("z"))
        z.select(col("vec_id"),
            floor(col("z.scale") * 1e9).cast("long").as("scale_e9"),
            graft.functions.Int8Vec.dotCol(col("z.q"), col("z.q")).as("qq"))
          .orderBy("vec_id")
      },
      Some("""WITH z AS (
                SELECT vec_id,
                  list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                  embedding
                FROM embeddings),
              q AS (
                SELECT vec_id, scale,
                  CASE WHEN scale > 0 THEN
                    list_transform(embedding, x -> CAST(greatest(-127.0,
                      least(127.0, floor(CAST(x AS DOUBLE)/scale + 0.5))) AS BIGINT))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS qv
                FROM z)
              SELECT vec_id,
                CAST(floor(scale * 1e9) AS BIGINT) AS scale_e9,
                CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS qq
              FROM q ORDER BY vec_id""")),

    QueryDef("x27_int8_ann",
      // end-to-end QUANTIZED search: candidates scored with the
      // integer approximate cosine (scales cancel — three exact int
      // sums and one IEEE division, identical on every engine), ranked
      // with the same bounded top-k tail as x06. At scale this scan
      // reads a quarter of the bytes of the float index; rerank the
      // survivors with full-precision cosine when the ~2·√dim/127 gap
      // matters.
      (s, d) => {
        val z = embeddings(s, d)
          .select(col("vec_id"), Similarity.int8Quantize(col("embedding")).as("z"))
          .select(col("vec_id"), col("z.q").as("qv"))
          .withColumn("qq", graft.functions.Int8Vec.dotCol(col("qv"), col("qv")))
        val queries = z.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
            col("qq").as("q_qq"))
        val joined = operators.Rebalance(z).join(broadcast(queries))
          .where(col("q_id") =!= col("vec_id"))
          .withColumn("cosine", Similarity.approxCosineInt8WithNorms(
            col("q_qv"), col("qv"), col("q_qq"), col("qq")))
        Similarity.rankTopK(joined, "q_id", "vec_id", k = 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH z AS (
                SELECT vec_id,
                  list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                  embedding
                FROM embeddings),
              q AS (
                SELECT vec_id,
                  CASE WHEN scale > 0 THEN
                    list_transform(embedding, x -> CAST(greatest(-127.0,
                      least(127.0, floor(CAST(x AS DOUBLE)/scale + 0.5))) AS BIGINT))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS qv,
                  CASE WHEN scale > 0 THEN
                    list_sum(list_transform(embedding, x ->
                      CAST(greatest(-127.0, least(127.0,
                        floor(CAST(x AS DOUBLE)/scale + 0.5))) AS BIGINT) *
                      CAST(greatest(-127.0, least(127.0,
                        floor(CAST(x AS DOUBLE)/scale + 0.5))) AS BIGINT)))
                  ELSE 0 END AS qq
                FROM z),
              sims AS (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  CASE WHEN a.qq > 0 AND b.qq > 0 THEN
                    CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
                      p -> p[1] * p[2])) AS DOUBLE)
                    / sqrt(CAST(a.qq AS DOUBLE) * CAST(b.qq AS DOUBLE))
                  ELSE 0.0 END AS cosine
                FROM q a JOIN q b ON b.vec_id <> a.vec_id
                WHERE a.vec_id < 20),
              ranked AS (
                SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims)
              SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
              FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("x08_embed_dup",
      // this synthetic corpus has no true near-dups (max pairwise
      // cosine ~0.51) — 0.35 exercises the operator end to end
      (s, d) => Dedup.embeddingDupPairs(embeddings(s, d), "vec_id", "embedding",
          dim = 64, threshold = 0.35, planes = 4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH b AS (
                SELECT vec_id, embedding,
                  ${bucketSql("embedding", 4)} AS bucket
                FROM embeddings),
              sims AS (
                SELECT l.vec_id AS id_a, r.vec_id AS id_b,
                  ${cosineSql("l.embedding", "r.embedding")} AS cosine
                FROM b l JOIN b r
                  ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
              SELECT id_a, id_b, round(cosine, 4) AS cosine
              FROM sims WHERE cosine >= 0.35 ORDER BY id_a, id_b""")),

    QueryDef("x15_ivf_ann",
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        // index build: deterministic integer seed-group centroids (the
        // KMeans path IvfAnn.trainCentroids stays available; this one
        // is engine-replayable so the whole IVF search is verified)
        val centroids = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding", nlist = 16)
        IvfAnn.topKInt(emb, queries, "vec_id", "embedding", "q_id", "q_vec",
            centroids, k = 5, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "rank")
      },
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
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1),
              probe AS (
                SELECT vec_id AS q_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist WHERE vec_id < 20) t
                WHERE rn <= 4),
              sims AS (
                SELECT p.q_id AS query_id, a.vec_id AS neighbor_id,
                  ${cosineSql("eq.embedding", "en.embedding")} AS cosine
                FROM probe p JOIN assign a ON p.cell = a.cell
                JOIN embeddings eq ON eq.vec_id = p.q_id
                JOIN embeddings en ON en.vec_id = a.vec_id
                WHERE a.vec_id <> p.q_id),
              ranked AS (
                SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims)
              SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine
              FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("x29_mixture_shuffle",
      // deterministic training mixture + epoch shuffle: each language
      // slice is downsampled to its mixture weight by the md5 draw,
      // union-tagged, and given the epoch-1 shuffle key (writing
      // sorted by that key IS the global shuffle at scale — never a
      // global row_number). Every decision replays on any engine.
      (s, d) => {
        val docs = documents(s, d)
        val mix = Sampling.weightedMixture(Seq(
          ("en", docs.where(col("lang") === "en"), 1.0),
          ("fr", docs.where(col("lang") === "fr"), 0.5),
          ("de", docs.where(col("lang") === "de"), 0.25)), "doc_id")
        mix.select(col("doc_id"), col("source_name"),
            Sampling.epochShuffleKey("doc_id", epoch = 1).as("shuffle_key"))
          .orderBy("shuffle_key", "doc_id")
      },
      Some("""WITH m AS (
                SELECT doc_id, 'en' AS source_name FROM documents
                WHERE lang = 'en'
                  AND CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':en'), 1, 15) AS BIGINT)
                    % 1000000 < 1000000
                UNION ALL
                SELECT doc_id, 'fr' FROM documents
                WHERE lang = 'fr'
                  AND CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':fr'), 1, 15) AS BIGINT)
                    % 1000000 < 500000
                UNION ALL
                SELECT doc_id, 'de' FROM documents
                WHERE lang = 'de'
                  AND CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':de'), 1, 15) AS BIGINT)
                    % 1000000 < 250000)
              SELECT doc_id, source_name,
                CAST('0x' || substring(md5(
                  '1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS shuffle_key
              FROM m ORDER BY shuffle_key, doc_id""")),

    QueryDef("x30_sequence_packing",
      // sample packing: every document gets its (chunk, sequence,
      // start offset) under a 4096-token budget — chunked running sums
      // (8 independent windows), never one global prefix sum; the
      // char count stands in for the token count to keep the replay
      // focused on the packing algebra
      (s, d) => Sampling.packSequences(
          documents(s, d).select("doc_id", "n_chars"), "doc_id", "n_chars",
          budget = 4096, epoch = 1, chunks = 8)
        .select(col("doc_id"), col("chunk"), col("seq"), col("start_off"))
        .orderBy("doc_id"),
      Some("""WITH k AS (
                SELECT doc_id, n_chars,
                  CAST('0x' || substring(md5(
                    '1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
                FROM documents),
              o AS (
                SELECT doc_id, CAST(key % 8 AS INT) AS chunk,
                  SUM(n_chars) OVER (PARTITION BY key % 8 ORDER BY key, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
                FROM k)
              SELECT doc_id, chunk,
                CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq,
                CAST(start_off AS BIGINT) AS start_off
              FROM o ORDER BY doc_id""")),

    QueryDef("x78_curriculum_pack",
      // curriculum-ordered packing: within each chunk, band-0 docs
      // pack before band-1 before band-2 (md5-shuffled within a
      // band), so early training sequences hold the best band — the
      // curriculum prior with NO global sort (same 8 bounded windows
      // as x30). The band here is a deterministic length tier
      // standing in for the x45 quality band, keeping the replay
      // focused on the ordering algebra
      (s, d) => Sampling.packSequencesCurriculum(
          documents(s, d).select(col("doc_id"), col("n_chars"),
            least(lit(3L), floor(col("n_chars") / 300)).as("band")),
          "doc_id", "n_chars", "band",
          budget = 4096, epoch = 1, chunks = 8)
        .select(col("doc_id"), col("band"), col("chunk"), col("seq"),
          col("start_off"))
        .orderBy("doc_id"),
      Some("""WITH k AS (
                SELECT doc_id, n_chars,
                  least(3, CAST(floor(n_chars / 300.0) AS BIGINT)) AS band,
                  CAST('0x' || substring(md5(
                    '1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
                FROM documents),
              o AS (
                SELECT doc_id, band, CAST(key % 8 AS INT) AS chunk,
                  SUM(n_chars) OVER (PARTITION BY key % 8
                    ORDER BY band ASC NULLS LAST, key, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
                FROM k)
              SELECT doc_id, band, chunk,
                CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq,
                CAST(start_off AS BIGINT) AS start_off
              FROM o ORDER BY doc_id""")),

    QueryDef("x79_gopher_rules",
      // Gopher-style rule bundle: the per-rule boolean gates real
      // curation pipelines use (word count, mean word length, symbol/
      // bullet/ellipsis rates, alphabetic fraction, stopword floor),
      // each threshold in cross-multiplied INTEGER form — no double
      // ratio exists, so no ulp can sit on a gate boundary. Map-only
      (s, d) => TextAnalysis.gopherRules(documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH b AS (
                SELECT doc_id, coalesce(text, '') AS t,
                  trim(regexp_replace(lower(coalesce(text, '')),
                    '[^a-z0-9]+', ' ', 'g')) AS norm
                FROM documents),
              c AS (
                SELECT doc_id, t, norm,
                  list_filter(string_split(norm, ' '), x -> x <> '') AS toks
                FROM b),
              m AS (
                SELECT doc_id,
                  CAST(len(toks) AS BIGINT) AS n_words,
                  CAST(length(norm) - (len(toks) - 1) AS BIGINT) AS word_chars,
                  CAST(len(toks) - len(regexp_extract_all(norm, '\b[0-9]+\b'))
                    AS BIGINT) AS alpha_words,
                  CAST(len(regexp_extract_all(t, '#'))
                    + len(regexp_extract_all(t, '\.\.\.'))
                    + len(regexp_extract_all(t, '…')) AS BIGINT) AS symbols,
                  CAST(len(regexp_extract_all(t, '\n')) + 1 AS BIGINT) AS n_lines,
                  CAST(len(regexp_extract_all(t, '(?m)^\s*[-*•]'))
                    AS BIGINT) AS bullet_lines,
                  CAST(len(regexp_extract_all(t, '(?m)(\.\.\.|…)$'))
                    AS BIGINT) AS ellipsis_lines,
                  CAST(len(list_filter(toks, x -> list_contains(
                    ['the','and','is','of','to','in','that','it','was','for'],
                    x))) AS BIGINT) AS stop_hits
                FROM c)
              SELECT doc_id, n_words,
                (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
                (n_words > 0 AND word_chars >= n_words * 3
                  AND word_chars <= n_words * 10) AS mean_word_ok,
                (symbols * 10 <= n_words) AS symbol_ok,
                (bullet_lines * 10 <= n_lines * 9) AS bullet_ok,
                (ellipsis_lines * 10 <= n_lines * 3) AS ellipsis_ok,
                (n_words > 0 AND alpha_words * 5 >= n_words * 4) AS alpha_ok,
                (stop_hits >= 2) AS stopword_ok,
                ((n_words >= 50 AND n_words <= 100000)
                  AND (n_words > 0 AND word_chars >= n_words * 3
                    AND word_chars <= n_words * 10)
                  AND (symbols * 10 <= n_words)
                  AND (bullet_lines * 10 <= n_lines * 9)
                  AND (ellipsis_lines * 10 <= n_lines * 3)
                  AND (n_words > 0 AND alpha_words * 5 >= n_words * 4)
                  AND (stop_hits >= 2)) AS pass
              FROM m ORDER BY doc_id""")),

    QueryDef("x80_content_divergence",
      // content-distribution divergence between two sources, computed
      // from their x77 count states ALONE: KL over the hashed
      // bag-of-ngrams models with add-one smoothing — topic/vocabulary
      // shift moves it while a quality mean stands still (x71's twin
      // on the CONTENT axis). Bucket-bounded work, exact-integer
      // numerator, one division at readout — one output row
      (s, d) => {
        val docs = documents(s, d)
        Sampling.dsirDivergence(
          Sampling.dsirState(docs.where(col("source") === "src0"),
            "text", buckets = 1024, salt = "dsir"),
          Sampling.dsirState(docs.where(col("source") === "src1"),
            "text", buckets = 1024, salt = "dsir"),
          buckets = 1024)
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM documents WHERE source IN ('src0', 'src1')),
              f AS (
                SELECT doc_id, source, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM t),
              fb AS (
                SELECT source,
                  CAST('0x' || substring(md5('dsir:' || feat), 1, 15) AS BIGINT)
                    % 1024 AS bucket
                FROM f),
              sa AS (SELECT bucket, count(*) AS ca FROM fb
                     WHERE source = 'src0' GROUP BY 1),
              sb AS (SELECT bucket, count(*) AS cb FROM fb
                     WHERE source = 'src1' GROUP BY 1),
              tot AS (SELECT (SELECT coalesce(sum(ca), 0) FROM sa) AS ta,
                             (SELECT coalesce(sum(cb), 0) FROM sb) AS tb),
              dom AS (SELECT unnest(range(1024)) AS bucket),
              l AS (
                SELECT coalesce(ca, 0) + 1 AS sa_, ta, tb,
                  CAST(round(1000000.0 * (ln(coalesce(ca, 0) + 1)
                    - ln(ta + 1024) - ln(coalesce(cb, 0) + 1)
                    + ln(tb + 1024))) AS BIGINT) AS lr
                FROM dom LEFT JOIN sa USING (bucket)
                LEFT JOIN sb USING (bucket) CROSS JOIN tot)
              SELECT CAST(max(ta) AS BIGINT) AS total_a,
                CAST(max(tb) AS BIGINT) AS total_b,
                CAST(sum(sa_ * lr) AS BIGINT) AS kl_num_unats,
                CAST(floor(CAST(sum(sa_ * lr) AS DOUBLE)
                  / (max(ta) + 1024)) AS BIGINT) AS kl_micronats
              FROM l""")),

    QueryDef("x81_line_strip",
      // within-doc repeated-line removal: keep the first occurrence
      // of every non-blank line, preserve order, blanks always
      // survive (structure, not content) — the intra-doc half of
      // boilerplate cleanup (x66 is the cross-doc half). Map-only
      // per-row array algebra; the oracle replays the indexed filter
      (s, d) => TextAnalysis.stripRepeatedLines(
          documents(s, d).select("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "text", "n_lines", "n_kept")
        .orderBy("doc_id"),
      Some("""WITH l AS (
                SELECT doc_id, string_split(text, chr(10)) AS lines
                FROM documents),
              k AS (
                SELECT doc_id, lines,
                  list_filter(lines, (x, i) -> trim(x) = ''
                    OR list_position(list_slice(lines, 1, i - 1), x) = 0)
                    AS kept
                FROM l)
              SELECT doc_id,
                CASE WHEN lines IS NULL THEN NULL
                  ELSE array_to_string(kept, chr(10)) END AS text,
                coalesce(len(lines), 0) AS n_lines,
                coalesce(len(kept), 0) AS n_kept
              FROM k ORDER BY doc_id""")),

    QueryDef("x82_substring_dedup",
      // exact-substring span dedup (Lee et al. 2021): any 5-token span
      // occurring >= 2x corpus-wide is removed everywhere except its
      // minimal (doc, pos) occurrence; docs are rewritten in normalized
      // token space. The finest dedup tier: doc (x01) -> chunk (x44) ->
      // line (x81) -> span (here). The oracle replays the gram counting
      // on gram TEXT (space-join is injective over space-free tokens),
      // so it also audits the engine's md5-chain keying end to end
      (s, d) => Dedup.stripDuplicateSpans(
          documents(s, d).select("doc_id", "text"), "doc_id", "text", n = 5)
        // row-preserving guards (always true) that REFERENCE the
        // rewrite outputs: Bench forces with count(), under which
        // Catalyst would otherwise eliminate the distinct-keyed outer
        // join and prune the entire gram pipeline + rewrite — timing
        // a token scan instead of the operator (measured: 0.27 s vs
        // the real ~1 s). Verify results are unchanged (no row drops)
        .where(col("n_removed") >= 0 &&
          length(coalesce(col("text"), lit(""))) >= 0)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
                SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                  ELSE list_filter(string_split(trim(regexp_replace(
                    lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') END AS toks
                FROM documents),
              g AS (
                SELECT doc_id, CAST(s AS BIGINT) AS pos,
                  array_to_string(list_slice(toks,
                    CAST(s + 1 AS INT), CAST(s + 5 AS INT)), ' ') AS gram
                FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks) - 4)) AS s
                      FROM tk WHERE len(toks) >= 5)),
              mk AS (
                SELECT doc_id, pos FROM (
                  SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY gram
                      ORDER BY doc_id, pos) AS rn,
                    count(*) OVER (PARTITION BY gram) AS cnt
                  FROM g) WHERE cnt >= 2 AND rn > 1),
              rm AS (
                SELECT DISTINCT doc_id, pos + u.o AS idx
                FROM mk, unnest(range(0, 5)) AS u(o)),
              ag AS (
                SELECT doc_id, count(*) AS n_removed,
                  list_sort(list(idx)) AS rmidx
                FROM rm GROUP BY doc_id)
              SELECT t.doc_id,
                CASE WHEN t.toks IS NULL THEN NULL
                  ELSE coalesce(array_to_string(list_filter(t.toks,
                    (x, i) -> NOT list_contains(coalesce(a.rmidx, []),
                      CAST(i - 1 AS BIGINT))), ' '), '')
                END AS text,
                coalesce(len(t.toks), 0) AS n_tokens,
                coalesce(a.n_removed, 0) AS n_removed
              FROM tk t LEFT JOIN ag a USING (doc_id)
              ORDER BY doc_id"""),
      // the heaviest r8 addition (two gram fan-outs, gram hash agg,
      // occurrence join, per-doc rewrite) must be bench-visible
      headline = true),

    QueryDef("x83_span_grow_intake",
      // the SPAN tier's growing state (the x46/x50 algebra at
      // substring granularity): gram MEMBERSHIP persisted
      // shard-partitioned — a gram seen in any earlier batch has its
      // keeper settled, so later occurrences cut unconditionally;
      // within-batch multiplicity is the batch's own min-(id,pos)
      // rule. Each intake reads only the shards its own grams hash
      // to and appends only its NEW grams. Sequential rewrite over
      // three id-ordered batches == the one-shot x82 bit-for-bit —
      // the oracle IS the one-shot replay
      (s, d) => {
        val docs = documents(s, d).select("doc_id", "text")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_span_idx_" +
          Integer.toHexString(d.hashCode)
        val b1 = docs.where(col("doc_id") < 250)
        Dedup.buildSpanIndex(b1, "doc_id", "text", n = 5, path)
        val o1 = Dedup.stripDuplicateSpans(b1, "doc_id", "text", n = 5)
        val o2 = Dedup.intakeStepAgainstSpanIndex(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", "text")
        val o3 = Dedup.intakeStepAgainstSpanIndex(s, path,
          docs.where(col("doc_id") >= 400), "doc_id", "text")
        o1.unionByName(o2).unionByName(o3).orderBy("doc_id")
      },
      Some("""WITH tk AS (
                SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                  ELSE list_filter(string_split(trim(regexp_replace(
                    lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') END AS toks
                FROM documents),
              g AS (
                SELECT doc_id, CAST(s AS BIGINT) AS pos,
                  array_to_string(list_slice(toks,
                    CAST(s + 1 AS INT), CAST(s + 5 AS INT)), ' ') AS gram
                FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks) - 4)) AS s
                      FROM tk WHERE len(toks) >= 5)),
              mk AS (
                SELECT doc_id, pos FROM (
                  SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY gram
                      ORDER BY doc_id, pos) AS rn,
                    count(*) OVER (PARTITION BY gram) AS cnt
                  FROM g) WHERE cnt >= 2 AND rn > 1),
              rm AS (
                SELECT DISTINCT doc_id, pos + u.o AS idx
                FROM mk, unnest(range(0, 5)) AS u(o)),
              ag AS (
                SELECT doc_id, count(*) AS n_removed,
                  list_sort(list(idx)) AS rmidx
                FROM rm GROUP BY doc_id)
              SELECT t.doc_id,
                CASE WHEN t.toks IS NULL THEN NULL
                  ELSE coalesce(array_to_string(list_filter(t.toks,
                    (x, i) -> NOT list_contains(coalesce(a.rmidx, []),
                      CAST(i - 1 AS BIGINT))), ' '), '')
                END AS text,
                coalesce(len(t.toks), 0) AS n_tokens,
                coalesce(a.n_removed, 0) AS n_removed
              FROM tk t LEFT JOIN ag a USING (doc_id)
              ORDER BY doc_id""")),

    QueryDef("x86_surgical_decontamination",
      // the rewrite alternative to drop-based decontamination (x19/
      // x23/x67 discard whole docs): cut ONLY the spans shared with
      // the eval suite (docs < 50, the holdout convention) and keep
      // the rest of each training doc. Eval items shorter than n
      // contribute no spans (the drop tier's padded shingles cover
      // those); clean docs pass through untouched
      (s, d) => {
        val docs = documents(s, d).select("doc_id", "text")
        Dedup.stripEvalSpans(docs.where(col("doc_id") >= 50), "doc_id", "text",
          docs.where(col("doc_id") < 50), "text", n = 5)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
                SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                  ELSE list_filter(string_split(trim(regexp_replace(
                    lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') END AS toks
                FROM documents),
              g AS (
                SELECT doc_id, CAST(s AS BIGINT) AS pos,
                  array_to_string(list_slice(toks,
                    CAST(s + 1 AS INT), CAST(s + 5 AS INT)), ' ') AS gram
                FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks) - 4)) AS s
                      FROM tk WHERE len(toks) >= 5)),
              ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
              mk AS (
                SELECT doc_id, pos FROM g
                WHERE doc_id >= 50 AND gram IN (SELECT gram FROM ev)),
              rm AS (
                SELECT DISTINCT doc_id, pos + u.o AS idx
                FROM mk, unnest(range(0, 5)) AS u(o)),
              ag AS (
                SELECT doc_id, count(*) AS n_removed,
                  list_sort(list(idx)) AS rmidx
                FROM rm GROUP BY doc_id)
              SELECT t.doc_id,
                CASE WHEN t.toks IS NULL THEN NULL
                  ELSE coalesce(array_to_string(list_filter(t.toks,
                    (x, i) -> NOT list_contains(coalesce(a.rmidx, []),
                      CAST(i - 1 AS BIGINT))), ' '), '')
                END AS text,
                coalesce(len(t.toks), 0) AS n_tokens,
                coalesce(a.n_removed, 0) AS n_removed
              FROM tk t LEFT JOIN ag a USING (doc_id)
              WHERE t.doc_id >= 50
              ORDER BY doc_id""")),

    QueryDef("x85_span_takedown",
      // retention/takedown on the SPAN tier: docs 100-149's FOUNDED
      // grams are deleted from the membership index after the build,
      // so a later batch repeating those spans keeps them (admitted
      // again), while spans founded by retained docs keep cutting.
      // Membership semantics make the delete exact: non-keeper
      // occurrences were cut from their rewrites, so a removed
      // founder means NO surviving doc carries the span
      (s, d) => {
        val docs = documents(s, d).select("doc_id", "text")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_takedown_sp_" +
          Integer.toHexString(d.hashCode)
        Dedup.buildSpanIndex(docs.where(col("doc_id") < 250),
          "doc_id", "text", n = 5, path)
        Dedup.deleteFromSpanIndex(s, path,
          docs.where(col("doc_id") >= 100 && col("doc_id") < 150),
          "doc_id", "text")
        Dedup.intakeStepAgainstSpanIndex(s, path,
          docs.where(col("doc_id") >= 250 && col("doc_id") < 400),
          "doc_id", "text")
          .orderBy("doc_id")
      },
      // oracle: live state = build-corpus grams whose founding
      // (min-doc) owner survived the deletion; the batch cuts an
      // occurrence on a live-state hit or as a within-batch non-min
      // repeat (rn > 1 implies a second occurrence exists)
      Some("""WITH tk AS (
                SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                  ELSE list_filter(string_split(trim(regexp_replace(
                    lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') END AS toks
                FROM documents),
              g AS (
                SELECT doc_id, CAST(s AS BIGINT) AS pos,
                  array_to_string(list_slice(toks,
                    CAST(s + 1 AS INT), CAST(s + 5 AS INT)), ' ') AS gram
                FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks) - 4)) AS s
                      FROM tk WHERE len(toks) >= 5)),
              own AS (
                SELECT gram, min(doc_id) AS owner FROM g
                WHERE doc_id < 250 GROUP BY 1),
              live AS (
                SELECT gram FROM own WHERE owner < 100 OR owner >= 150),
              b AS (
                SELECT doc_id, pos, gram FROM g
                WHERE doc_id >= 250 AND doc_id < 400),
              mk AS (
                SELECT doc_id, pos FROM (
                  SELECT doc_id, pos, gram,
                    row_number() OVER (PARTITION BY gram
                      ORDER BY doc_id, pos) AS rn
                  FROM b) r
                WHERE gram IN (SELECT gram FROM live) OR rn > 1),
              rm AS (
                SELECT DISTINCT doc_id, pos + u.o AS idx
                FROM mk, unnest(range(0, 5)) AS u(o)),
              ag AS (
                SELECT doc_id, count(*) AS n_removed,
                  list_sort(list(idx)) AS rmidx
                FROM rm GROUP BY doc_id)
              SELECT t.doc_id,
                CASE WHEN t.toks IS NULL THEN NULL
                  ELSE coalesce(array_to_string(list_filter(t.toks,
                    (x, i) -> NOT list_contains(coalesce(a.rmidx, []),
                      CAST(i - 1 AS BIGINT))), ' '), '')
                END AS text,
                coalesce(len(t.toks), 0) AS n_tokens,
                coalesce(a.n_removed, 0) AS n_removed
              FROM tk t LEFT JOIN ag a USING (doc_id)
              WHERE t.doc_id >= 250 AND t.doc_id < 400
              ORDER BY doc_id""")),

    QueryDef("x55_multi_epoch_packing",
      // x30 for E epochs in ONE pass (r8): the epoch fan-out salts the
      // shuffle key per epoch and the running sums window by
      // (epoch, chunk) — each epoch's packing is bit-identical to its
      // own packSequences run (MixSpec) while the input is scanned
      // once (plan-asserted); the oracle replays all three epochs from
      // a cross join
      (s, d) => Sampling.packSequencesEpochs(
          documents(s, d).select("doc_id", "n_chars"), "doc_id", "n_chars",
          budget = 4096, epochs = Seq(0, 1, 2), chunks = 8)
        .select(col("doc_id"), col("epoch"), col("chunk"), col("seq"),
          col("start_off"))
        .orderBy("doc_id", "epoch"),
      Some("""WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
              k AS (
                SELECT d.doc_id, d.n_chars, e.epoch,
                  CAST('0x' || substring(md5(
                    CAST(e.epoch AS VARCHAR) || ':' ||
                    CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
                FROM documents d CROSS JOIN e),
              o AS (
                SELECT doc_id, epoch, CAST(key % 8 AS INT) AS chunk,
                  SUM(n_chars) OVER (PARTITION BY epoch, key % 8
                    ORDER BY key, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
                FROM k)
              SELECT doc_id, epoch, chunk,
                CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq,
                CAST(start_off AS BIGINT) AS start_off
              FROM o ORDER BY doc_id, epoch""")),

    QueryDef("x56_packing_manifest",
      // the per-sequence audit of the packed stream: docs touching /
      // starting in each sequence, occupied token slots, integer-ppm
      // fill — the artifact a training run reads to size itself and
      // the check that catches a mis-packed shard. Overhanging docs
      // attribute their slots to the sequences they actually cross
      // (bounded span explode), so every non-final sequence per chunk
      // audits exactly full
      (s, d) => Sampling.packingManifest(
          Sampling.packSequences(
            documents(s, d).select("doc_id", "n_chars"), "doc_id",
            "n_chars", budget = 4096, epoch = 1, chunks = 8),
          "n_chars", budget = 4096)
        .orderBy("chunk", "seq"),
      Some("""WITH k AS (
                SELECT doc_id, n_chars,
                  CAST('0x' || substring(md5(
                    '1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
                FROM documents),
              o AS (
                SELECT doc_id, n_chars, CAST(key % 8 AS INT) AS chunk,
                  SUM(n_chars) OVER (PARTITION BY key % 8 ORDER BY key, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
                FROM k),
              spans AS (
                SELECT chunk, start_off, n_chars,
                  unnest(generate_series(
                    CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT),
                    CAST(floor(CAST(start_off + greatest(n_chars, 1) - 1
                      AS DOUBLE) / 4096) AS BIGINT))) AS seq
                FROM o)
              SELECT chunk, seq, count(*) AS n_docs,
                CAST(sum(CASE WHEN CAST(floor(CAST(start_off AS DOUBLE) / 4096)
                      AS BIGINT) = seq THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
                CAST(sum(least(start_off + n_chars, (seq + 1) * 4096)
                  - greatest(start_off, seq * 4096)) AS BIGINT) AS tokens,
                CAST(floor(sum(least(start_off + n_chars, (seq + 1) * 4096)
                  - greatest(start_off, seq * 4096)) * 1000000.0 / 4096)
                  AS BIGINT) AS fill_ppm
              FROM spans GROUP BY chunk, seq ORDER BY chunk, seq""")),

    QueryDef("x57_snapshot_diff",
      // data versioning: what changed between two corpus snapshots,
      // by content digest — added / removed / changed only, never the
      // unchanged bulk (output ∝ churn). The two snapshots are carved
      // deterministically from the documents table: ids ≡3 (mod 10)
      // arrive only in the new snapshot, ids ≡7 leave it, and ids
      // ≡0 (mod 5) carry a v0-salted digest in the old snapshot
      // (simulating re-crawled content)
      (s, d) => {
        val docs = documents(s, d)
        val oldSnap = docs.where(col("doc_id") % 10 =!= 3)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
                md5(concat(col("text"), lit(":v0"))))
              .otherwise(md5(col("text"))).as("digest"))
        val newSnap = docs.where(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), md5(col("text")).as("digest"))
        Snapshot.diff(oldSnap, newSnap, "doc_id", "digest")
          .orderBy("doc_id")
      },
      Some("""WITH o AS (
                SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN md5(text || ':v0')
                       ELSE md5(text) END AS old_digest
                FROM documents WHERE doc_id % 10 <> 3),
              n AS (
                SELECT doc_id, md5(text) AS new_digest
                FROM documents WHERE doc_id % 10 <> 7)
              SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                o.old_digest, n.new_digest,
                CASE WHEN n.new_digest IS NULL THEN 'removed'
                     WHEN o.old_digest IS NULL THEN 'added'
                     ELSE 'changed' END AS status
              FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
              WHERE n.new_digest IS NULL OR o.old_digest IS NULL
                 OR o.old_digest <> n.new_digest
              ORDER BY doc_id""")),

    QueryDef("x58_rejection_audit",
      // the "what did we throw away" review: per funnel-stage drop
      // reason, the total kill count plus a consistent 10-doc sample
      // (same docs every rerun — audits diff across config changes).
      // en-only allowlist so language drops are exercised (threshold 0.5,
      // maxRepetition 1.0 so the independently-oracled repetition
      // stage is a tautology; contamination off — oracled in x33)
      (s, d) => Curate.rejectionAudit(documents(s, d), "doc_id", "text",
          Curate.Config(langs = Seq("en"), maxRepetition = 1.0,
            jaccardThreshold = 0.5),
          eval = None, k = 10)
        .orderBy("reason", "doc_id"),
      Some(rejectionAuditOracle)),

    QueryDef("x59_cross_source_dups",
      // provenance view of the x03 pair relation: near-dup pair counts
      // per unordered (source, source) cell — the mirrored-crawl /
      // licensing-exposure diagnostic. The oracle extends the x03
      // replay with the two label joins and the least/greatest fold
      (s, d) => {
        val docs = documents(s, d)
        Dedup.crossSourceDupMatrix(
          Dedup.minHashDupPairs(docs, "doc_id", "text",
            shingleN = 3, k = 64, bands = 16, threshold = 0.5),
          docs, "doc_id", "source")
          .orderBy("src_a", "src_b")
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
              lab AS (
                SELECT least(da.source, db.source) AS src_a,
                       greatest(da.source, db.source) AS src_b
                FROM prs p
                JOIN documents da ON da.doc_id = p.id_a
                JOIN documents db ON db.doc_id = p.id_b)
              SELECT src_a, src_b, count(*) AS n_pairs
              FROM lab GROUP BY src_a, src_b ORDER BY src_a, src_b""")),

    QueryDef("x60_semantic_grow_intake",
      // the SEMANTIC tier's growing intake (x46/x50's embedding
      // sibling, completing the three dedup tiers): an IVF index is
      // built over the first 250 vectors with its frozen centroid
      // model persisted IN the layout, then two batches each run one
      // intakeStepAgainstIndexInt — within-batch SemDeDup (min-id
      // cluster survivor), cell-pruned corpus probe, APPEND of the
      // accepted vectors — so a batch-2 vector semantically duplicating
      // an ACCEPTED batch-1 vector is dropped even though neither was
      // in the build corpus. threshold 0.3: the synthetic embeddings
      // have same-cell cosines up to ~0.52, so every drop rule
      // (corpus, within-batch, grown-index) actually fires at all SFs
      (s, d) => {
        val emb = embeddings(s, d)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_sem_idx_" +
          Integer.toHexString(d.hashCode)
        val cents = IvfAnn.seedCentroidsInt(emb.where(col("vec_id") < 250),
          "vec_id", "embedding", nlist = 16)
        IvfAnn.buildIndexInt(emb.where(col("vec_id") < 250),
          "vec_id", "embedding", cents, path)
        val s1 = IvfAnn.intakeStepAgainstIndexInt(s, path,
          emb.where(col("vec_id") >= 250 && col("vec_id") < 400),
          "vec_id", "embedding", threshold = 0.3)
        val s2 = IvfAnn.intakeStepAgainstIndexInt(s, path,
          emb.where(col("vec_id") >= 400),
          "vec_id", "embedding", threshold = 0.3)
        s1.select("vec_id", "label")
          .unionByName(s2.select("vec_id", "label"))
          .orderBy("vec_id")
      },
      // the oracle replays the x34 SemDeDup pipeline for the DUP-PAIR
      // relation (seed centroids from the BUILD corpus only, nearest-
      // cell assignment of every vector, same-cell exact-cosine pairs),
      // then the x46 sequential first-wins algebra on top: batch-1
      // keeps min-id component survivors with no corpus dup; batch-2
      // additionally drops dups of batch-1's ACCEPTED vectors
      Some(s"""WITH RECURSIVE q AS (
                SELECT vec_id, embedding,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                FROM embeddings),
              cent AS (
                SELECT vec_id % 16 AS cell, d,
                  CAST(floor(CAST(sum(qv[CAST(d AS INT)]) AS DOUBLE)
                             / count(*) + 0.5) AS BIGINT) AS c
                FROM q, range(1, 65) t(d) WHERE vec_id < 250
                GROUP BY 1, 2),
              dist AS (
                SELECT q.vec_id, ct.cell,
                  CAST(sum((q.qv[CAST(ct.d AS INT)] - ct.c)
                         * (q.qv[CAST(ct.d AS INT)] - ct.c)) AS BIGINT) AS d2
                FROM q, cent ct
                GROUP BY q.vec_id, ct.cell),
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1),
              pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM assign a JOIN assign b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                JOIN embeddings ea ON ea.vec_id = a.vec_id
                JOIN embeddings eb ON eb.vec_id = b.vec_id
                WHERE ${cosineSql("ea.embedding", "eb.embedding")} >= 0.3),
              e1 AS (
                SELECT id_a, id_b FROM pairs
                WHERE id_a >= 250 AND id_a < 400 AND id_b >= 250 AND id_b < 400
                UNION ALL
                SELECT id_b, id_a FROM pairs
                WHERE id_a >= 250 AND id_a < 400 AND id_b >= 250 AND id_b < 400),
              r1 AS (
                SELECT id_a AS id, id_a AS r FROM e1
                UNION
                SELECT re.id, e.id_b AS r FROM r1 re JOIN e1 e ON e.id_a = re.r),
              a1 AS (
                SELECT vec_id FROM embeddings
                WHERE vec_id >= 250 AND vec_id < 400
                  AND vec_id NOT IN
                    (SELECT id FROM r1 GROUP BY id HAVING min(r) < id)
                  AND vec_id NOT IN
                    (SELECT id_b FROM pairs WHERE id_a < 250)),
              e2 AS (
                SELECT id_a, id_b FROM pairs
                WHERE id_a >= 400 AND id_b >= 400
                UNION ALL
                SELECT id_b, id_a FROM pairs
                WHERE id_a >= 400 AND id_b >= 400),
              r2 AS (
                SELECT id_a AS id, id_a AS r FROM e2
                UNION
                SELECT re.id, e.id_b AS r FROM r2 re JOIN e2 e ON e.id_a = re.r),
              a2 AS (
                SELECT vec_id FROM embeddings
                WHERE vec_id >= 400
                  AND vec_id NOT IN
                    (SELECT id FROM r2 GROUP BY id HAVING min(r) < id)
                  AND vec_id NOT IN
                    (SELECT id_b FROM pairs WHERE id_a < 250)
                  AND vec_id NOT IN
                    (SELECT p.id_b FROM pairs p
                     JOIN a1 ON p.id_a = a1.vec_id))
              SELECT vec_id, label FROM embeddings
              WHERE vec_id IN (SELECT vec_id FROM a1
                               UNION ALL SELECT vec_id FROM a2)
              ORDER BY vec_id""")),

    QueryDef("x61_ivf_cell_profile",
      // the observability half of the frozen-centroid drift contract:
      // per-cell population of the IVF assignment as (count, floored
      // integer-ppm share). Run over a raw corpus before a build, or
      // over a grown layout's rows to decide when drift has crossed
      // the rebuild tolerance — the monitoring the appendToIndexInt
      // scaladoc promises
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        IvfAnn.cellProfile(emb, "vec_id", "embedding", cents).orderBy("cell")
      },
      // the x15 assignment replay (seed centroids, exact integer
      // nearest-cell argmin, ties to the lower cell), then a plain
      // group-count with integer-division ppm
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
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1)
              SELECT cell, count(*) AS n_vectors,
                (count(*) * 1000000)
                  // (SELECT count(*) FROM embeddings) AS share_ppm
              FROM assign GROUP BY cell ORDER BY cell""")),

    QueryDef("x72_diversity_sample",
      // cluster-balanced corpus cap (the D4/SemDeDup companion): dedup
      // removes copies, not redundancy — topical mass survives it.
      // Cap each IVF cell at perCell vectors, chosen by the smallest
      // md5 draws within the cell: over-cap semantic regions shrink to
      // the cap, tail regions pass whole. Map-only assignment +
      // k-bounded per-cell quota — the shuffle carries the cap, never
      // the cell population
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        IvfAnn.diversitySample(emb, "vec_id", "embedding", cents,
            perCell = 20)
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
          .orderBy("vec_id")
      },
      // the x61 assignment replay (seed centroids, exact integer
      // nearest-cell argmin, ties to the lower cell) + the x38 quota
      // replay (52-bit md5 draw, ties by id) over the cell
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
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1)
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
                  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 13) AS BIGINT),
                    vec_id) AS rn
                FROM assign) t
              WHERE rn <= 20 ORDER BY vec_id""")),

    QueryDef("x62_ann_recall",
      // recall@k of the IVF search against the exact brute force —
      // the drift monitor's decision number: nprobe=2 of 16 cells, so
      // the audit measures a genuinely lossy configuration (some
      // queries land below 1.0) instead of a vacuous all-ones table.
      // Denominator = the exact side's ACTUAL row count (rankTopK's
      // no-rank contract), floored integer ppm
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        IvfAnn.recallAtK(emb, queries, "vec_id", "embedding", "q_id", "q_vec",
          cents, k = 5, nprobe = 2).orderBy("query_id")
      },
      // replay of BOTH rankings: the x15 IVF pipeline at nprobe=2 and
      // the x06 brute-force ranking, identical (cosine DESC, id) tie
      // rule on each, then per-query intersection counts
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
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1),
              probe AS (
                SELECT vec_id AS q_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist WHERE vec_id < 50) t
                WHERE rn <= 2),
              isims AS (
                SELECT p.q_id AS query_id, a.vec_id AS neighbor_id,
                  ${cosineSql("eq.embedding", "en.embedding")} AS cosine
                FROM probe p JOIN assign a ON p.cell = a.cell
                JOIN embeddings eq ON eq.vec_id = p.q_id
                JOIN embeddings en ON en.vec_id = a.vec_id
                WHERE a.vec_id <> p.q_id),
              ivf AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS rn
                  FROM isims) t WHERE rn <= 5),
              esims AS (
                SELECT eq.vec_id AS query_id, en.vec_id AS neighbor_id,
                  ${cosineSql("eq.embedding", "en.embedding")} AS cosine
                FROM embeddings eq JOIN embeddings en
                  ON eq.vec_id < 50 AND en.vec_id <> eq.vec_id),
              ex AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS rn
                  FROM esims) t WHERE rn <= 5),
              h AS (
                SELECT i.query_id, count(*) AS hits
                FROM ivf i JOIN ex e USING (query_id, neighbor_id)
                GROUP BY i.query_id),
              nx AS (
                SELECT query_id, count(*) AS n_exact FROM ex
                GROUP BY query_id)
              SELECT qs.query_id, coalesce(h.hits, 0) AS hits,
                (coalesce(h.hits, 0) * 1000000) // nx.n_exact AS recall_ppm
              FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
                    WHERE vec_id < 50) qs
              LEFT JOIN nx USING (query_id) LEFT JOIN h USING (query_id)
              ORDER BY qs.query_id""")),

    QueryDef("x16_group_centroids",
      (s, d) => {
        val emb = embeddings(s, d).withColumn("grp", col("vec_id") % 10)
        Similarity.groupCentroids(emb, "grp", "embedding")
          .select(col("grp"),
            round(element_at(col("centroid"), 1), 6).as("d0"),
            round(element_at(col("centroid"), 16), 6).as("d15"),
            round(element_at(col("centroid"), 32), 6).as("d31"),
            round(element_at(col("centroid"), 64), 6).as("d63"))
          .orderBy("grp")
      },
      Some("""SELECT vec_id % 10 AS grp,
                round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS d0,
                round(avg(CAST(embedding[16] AS DOUBLE)), 6) AS d15,
                round(avg(CAST(embedding[32] AS DOUBLE)), 6) AS d31,
                round(avg(CAST(embedding[64] AS DOUBLE)), 6) AS d63
              FROM embeddings GROUP BY 1 ORDER BY grp""")),

    // ------------------------------------------------- SQL API surface
    QueryDef("q31_sql_api",
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_returnflag,
                   round(sum(l_discount), 4) AS sum_disc, count(*) AS n
                 FROM lineitem_v GROUP BY 1 ORDER BY 1""")
      },
      Some("""SELECT l_returnflag, round(sum(l_discount), 4) AS sum_disc,
                count(*) AS n
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    QueryDef("x17_stratified_sample",
      // rebalance an imbalanced corpus: downsample the majority
      // language, keep the rest — the standard training-mix op. The
      // md5-derived draw makes the survivor set a pure function of the
      // data (auditable, engine-portable), unlike seeded Bernoulli.
      (s, d) => Sampling.deterministicSampleBy(documents(s, d), "lang", "doc_id",
          Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0))
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang"),
      // ELSE 0, matching the operator: strata absent from the rate map
      // are DROPPED (coalesce-to-0 threshold), not kept
      Some("""SELECT lang, count(*) AS n_docs FROM documents
              WHERE CAST('0x' || substring(
                      md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 15) AS BIGINT)
                    % 1000000
                    < CASE lang WHEN 'en' THEN 250000
                                WHEN 'de' THEN 1000000 WHEN 'es' THEN 1000000
                                WHEN 'fr' THEN 1000000 WHEN 'zh' THEN 1000000
                                ELSE 0 END
              GROUP BY lang ORDER BY lang""")),

    QueryDef("x18_consistent_sample",
      // exactly-3-docs-per-source deterministic sample; md5 selection
      // is reproducible by the oracle
      (s, d) => Sampling.consistentSamplePerGroup(
          documents(s, d), "source", "doc_id", k = 3)
        .select("source", "doc_id")
        .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id FROM (
                SELECT source, doc_id, row_number() OVER (
                  PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM documents) t
              WHERE rk <= 3 ORDER BY source, doc_id""")),

    // ================================================= extensions: text analysis
    QueryDef("x09_langid",
      // scored from the one-pass DocStats struct (the oracle replays
      // the HOF semantics — PropertiesSpec pins the two forms equal)
      (s, d) => documents(s, d)
        .withColumn("__stats", TextAnalysis.docStats(col("text")))
        .select(col("doc_id"),
          TextAnalysis.langIdFromStats(col("__stats")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(langIdOracle)),

    QueryDef("x10_quality",
      // floor-truncate, don't round: round() tie-breaking at the 4th
      // decimal differs between engines on exact .xxxx5 scores
      (s, d) => documents(s, d)
        .withColumn("__stats", TextAnalysis.docStats(col("text")))
        .select(col("doc_id"),
          (floor(TextAnalysis.qualityScoreFromStats(col("text"), col("__stats"))
            * 10000) / 10000).as("quality"))
        .orderBy("doc_id"),
      Some(qualityOracle),
      headline = true),

    QueryDef("x11_token_counts",
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                len(list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '')) AS ws_tokens,
                len(regexp_extract_all(text,
                  '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+')) AS bpe_tokens
              FROM documents ORDER BY doc_id""")),

    QueryDef("x24_repetition_ratio",
      // Gopher/C4-style within-doc duplicate-2-gram filter
      (s, d) => documents(s, d)
        .withColumn("__stats", TextAnalysis.docStats(col("text"), gramN = 2))
        .select(col("doc_id"),
          TextAnalysis.repetitionRatioFromStats(col("__stats")).as("rep_ratio"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              g AS (
                SELECT doc_id, CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                    i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
                  ELSE CAST([] AS VARCHAR[]) END AS grams
                FROM tk)
              SELECT doc_id, CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                         / CAST(len(grams) AS DOUBLE)
                ELSE 0.0 END AS rep_ratio
              FROM g ORDER BY doc_id""")),

    QueryDef("x21_clean_text",
      // cleanup runs over text decorated with tags/urls/emails built
      // from the data itself, so the scrub is actually exercised
      (s, d) => {
        val decorated = concat(lit("<p>"), col("text"),
          lit("</p> see https://example.com/x?id=1 or mail a.b@c.org now"))
        documents(s, d)
          .select(col("doc_id"),
            TextAnalysis.cleanText(decorated).as("cleaned"))
          .withColumn("cleaned", substring(col("cleaned"), 1, 80))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, substring(
                trim(regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace('<p>' || text || '</p> see https://example.com/x?id=1 or mail a.b@c.org now',
                        '<[^>]*>', ' ', 'g'),
                      'https?://[^\s]+', ' ', 'g'),
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+', ' ', 'g'),
                  '\s+', ' ', 'g')), 1, 80) AS cleaned
              FROM documents ORDER BY doc_id""")),

    QueryDef("x12_rolling_fingerprint",
      (s, d) => documents(s, d)
        .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy("doc_id"),
      // the hash is plain mod-p polynomial arithmetic over normalized
      // ASCII — replayable by the oracle as a list_reduce
      Some("""WITH n AS (
                SELECT doc_id,
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
                FROM documents)
              SELECT doc_id,
                CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                  ELSE list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(1, length(t) + 1),
                        i -> CAST(unicode(substring(t, CAST(i AS INT), 1)) AS BIGINT))),
                    (a, b) -> (a * 31 + b) % 1000000007)
                END AS rhash
              FROM n ORDER BY doc_id""")),

    // ================================================= extensions: multimodal
    QueryDef("x13_multimodal_meta",
      (s, d) => {
        val packed = Multimodal.packFake(documents(s, d), "doc_id", "text")
        packed.select(col("media_id"), col("meta.format").as("format"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            length(col("media")).cast("long").as("payload_bytes"))
          .orderBy("media_id")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                  ((doc_id % 100000) * 2654435761 +
                   octet_length(encode(text)) * 1000003) % 2147483647 AS h,
                  octet_length(encode(text)) AS pb
                FROM documents)
              SELECT doc_id AS media_id,
                ['jpeg','png','wav','mp4'][CAST(h % 4 + 1 AS INT)] AS format,
                CAST(h % 1024 + 64 AS INT) AS width,
                CAST(h % 768 + 64 AS INT) AS height,
                pb AS payload_bytes
              FROM m ORDER BY media_id""")),

    QueryDef("x31_format_sniff",
      // REAL multimodal validation (no codec): payloads carry their
      // declared format's actual magic bytes; the sniffer reads the
      // first 12 bytes and must recover the declared format for every
      // row — the lake-ingest "blob claiming X starts like X" check
      (s, d) => {
        val packed = Multimodal.packFakeWithMagic(
          documents(s, d).where(col("doc_id") < 200), "doc_id", "text")
        packed.select(col("media_id"),
            col("meta.format").as("declared"),
            Multimodal.sniffFormat(col("media")).as("sniffed"),
            length(col("media")).cast("long").as("n_bytes"))
          .orderBy("media_id")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                  ((doc_id % 100000) * 2654435761 +
                   octet_length(encode(text)) * 1000003) % 2147483647 AS h,
                  encode(text) AS payload
                FROM documents WHERE doc_id < 200),
              p AS (
                SELECT doc_id,
                  ['jpeg','png','wav','mp4'][CAST(h % 4 + 1 AS INT)] AS declared,
                  unhex(['FFD8FFE0','89504E470D0A1A0A',
                         '524946460000000057415645',
                         '0000001866747970'][CAST(h % 4 + 1 AS INT)])
                    || payload AS media
                FROM m),
              s AS (
                SELECT doc_id, declared, media,
                  substr(hex(media), 1, 24) AS hh
                FROM p)
              SELECT doc_id AS media_id, declared,
                CASE
                  WHEN starts_with(hh, '89504E470D0A1A0A') THEN 'png'
                  WHEN starts_with(hh, 'FFD8FF') THEN 'jpeg'
                  WHEN starts_with(hh, '52494646')
                    AND substr(hh, 17, 8) = '57415645' THEN 'wav'
                  WHEN substr(hh, 9, 8) = '66747970' THEN 'mp4'
                  ELSE 'unknown' END AS sniffed,
                octet_length(media) AS n_bytes
              FROM s ORDER BY media_id""")),

    QueryDef("x32_byte_stats",
      // byte-level integrity fingerprint (codegen'd one-pass histogram
      // + position-weighted checksum): the no-codec corruption screen —
      // truncation shifts n_bytes, constant filler shows in
      // distinct/max_freq, any flipped byte changes the checksum
      (s, d) => {
        val packed = Multimodal.packFake(
          documents(s, d).where(col("doc_id") < 200 && col("n_chars") > 0),
          "doc_id", "text")
        packed.select(col("media_id"),
            Multimodal.byteStats(col("media")).as("st"))
          .select(col("media_id"), col("st.n_bytes"), col("st.distinct_bytes"),
            col("st.max_freq"), col("st.checksum"))
          .orderBy("media_id")
      },
      Some("""WITH p AS (
                SELECT doc_id, encode(text) AS media FROM documents
                WHERE doc_id < 200 AND n_chars > 0),
              b AS (
                SELECT doc_id, list_transform(range(0, octet_length(media)),
                  i -> CAST('0x' || substr(hex(media),
                    CAST(2*i + 1 AS INT), 2) AS BIGINT)) AS bs
                FROM p),
              u AS (SELECT doc_id, unnest(bs) AS v FROM b),
              h AS (SELECT doc_id, v, count(*) AS c FROM u GROUP BY 1, 2),
              agg AS (
                SELECT doc_id, CAST(count(*) AS INT) AS distinct_bytes,
                  CAST(max(c) AS INT) AS max_freq
                FROM h GROUP BY 1),
              ck AS (
                SELECT doc_id, CAST(len(bs) AS INT) AS n_bytes,
                  CAST(list_sum(list_transform(range(0, len(bs)),
                    i -> (bs[CAST(i + 1 AS INT)] + 1) * (i + 1))) AS BIGINT)
                    AS checksum
                FROM b)
              SELECT a.doc_id AS media_id, ck.n_bytes, a.distinct_bytes,
                a.max_freq, ck.checksum
              FROM agg a JOIN ck ON ck.doc_id = a.doc_id
              ORDER BY media_id""")),

    QueryDef("x14_frame_sample",
      (s, d) => {
        val packed = Multimodal.packFake(documents(s, d), "doc_id", "text")
        Multimodal.frameSample(packed, frameBytes = 32, stride = 4)
          .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
            max(col("frame_idx").cast("long")).as("max_idx"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                len(range(0, CAST(floor(octet_length(encode(text)) / 32) AS BIGINT), 4)) AS n_frames,
                list_max(range(0, CAST(floor(octet_length(encode(text)) / 32) AS BIGINT), 4)) AS max_idx
              FROM documents
              WHERE octet_length(encode(text)) >= 32
              GROUP BY doc_id, text ORDER BY media_id""")),

    QueryDef("x33_pii_redact",
      // PII scrub (map-only regexp chain): the raw corpus has no PII,
      // so the query first plants typed PII deterministically FROM the
      // row's own key (modular conditions vary the per-category
      // counts), then counts and redacts — both engines replay the
      // enrichment, so the scrub itself is what's verified
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
        val base = documents(s, d).select(col("doc_id"), enriched.as("__t"))
        base.select(
          (col("doc_id") +:
            TextAnalysis.piiCounts(col("__t"))
              .map { case (n, c) => c.cast("long").as(n) } :+
            TextAnalysis.redactPii(col("__t")).as("redacted")): _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH e AS (
                SELECT doc_id, text
                  || CASE WHEN doc_id % 3 = 0 THEN ' mail user'
                       || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
                  || CASE WHEN doc_id % 4 = 0 THEN ' via http://host'
                       || CAST(doc_id AS VARCHAR) || '.example/p?q=1' ELSE '' END
                  || CASE WHEN doc_id % 5 = 0 THEN ' ip 10.0.'
                       || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
                  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
                  AS t
                FROM documents)
              SELECT doc_id,
                len(regexp_extract_all(t, '${TextAnalysis.urlPattern}')) AS n_url,
                len(regexp_extract_all(t, '${TextAnalysis.emailPattern}')) AS n_email,
                len(regexp_extract_all(t, '${TextAnalysis.ipPattern}')) AS n_ip,
                len(regexp_extract_all(t, '${TextAnalysis.phonePattern}')) AS n_phone,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                  '${TextAnalysis.urlPattern}', '<URL>', 'g'),
                  '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
                  '${TextAnalysis.ipPattern}', '<IP>', 'g'),
                  '${TextAnalysis.phonePattern}', '<PHONE>', 'g') AS redacted
              FROM e ORDER BY doc_id""")),

    QueryDef("x34_semantic_dedup",
      // SemDeDup: the IVF cell assignment IS the blocking structure —
      // pairs compare only within a cell, so the quadratic term is
      // per-cell and capped (threshold 0.3: this synthetic corpus has
      // no true semantic dups, max pairwise cosine ~0.51)
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding", nlist = 16)
        Dedup.semanticDupPairs(emb, "vec_id", "embedding", cents, threshold = 0.3)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
          .orderBy("id_a", "id_b")
      },
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
              assign AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) AS rn FROM dist) t WHERE rn = 1),
              pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  ${cosineSql("ea.embedding", "eb.embedding")} AS cosine
                FROM assign a JOIN assign b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                JOIN embeddings ea ON ea.vec_id = a.vec_id
                JOIN embeddings eb ON eb.vec_id = b.vec_id)
              SELECT id_a, id_b, round(cosine, 4) AS cosine
              FROM pairs WHERE cosine >= 0.3 ORDER BY id_a, id_b"""),
      headline = true),

    QueryDef("x35_tfidf_topterms",
      // linear-idf TF-IDF: integer products + one correctly-rounded
      // double division, so the per-document ranking is bit-identical
      // on every engine (log-idf would diverge in the last ulp)
      (s, d) => TextAnalysis.tfIdfTopTerms(documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank"),
      Some("""WITH terms AS (
                SELECT doc_id, unnest(list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '')) AS term
                FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
              scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
                FROM tf JOIN df USING (term) CROSS JOIN n),
              ranked AS (
                SELECT doc_id, term, tf, df, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rank
                FROM scored)
              SELECT doc_id, rank, term, tf, df, score
              FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""),
      headline = true),

    QueryDef("x36_containment",
      // doc-in-doc detection: the output is the integer evidence pair
      // (n_shared, n_contained) rather than the ratio — a small-int
      // division can land exactly on a .00005 rounding tie, where
      // engines disagree at 4dp (the round-tie lesson); the ints are
      // tie-free and carry strictly more information
      (s, d) => Dedup.containmentPairs(documents(s, d), "doc_id", "text",
          n = 1, threshold = 0.95, blockOn = Seq("lang", "source"))
        .select(col("contained_id"), col("container_id"),
          col("n_shared"), col("n_contained"))
        .orderBy("contained_id", "container_id"),
      Some("""WITH toks AS (
                SELECT doc_id, lang, source,
                  list_distinct(list_filter(
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS sh
                FROM documents),
              pairs AS (
                SELECT l.doc_id AS contained_id, r.doc_id AS container_id,
                  len(list_intersect(l.sh, r.sh)) AS n_shared,
                  len(l.sh) AS n_contained
                FROM toks l JOIN toks r
                  ON l.lang = r.lang AND l.source = r.source
                  AND (len(l.sh) < len(r.sh)
                    OR (len(l.sh) = len(r.sh) AND l.doc_id < r.doc_id))
                WHERE len(l.sh) > 0)
              SELECT contained_id, container_id, n_shared, n_contained
              FROM pairs
              WHERE CAST(n_shared AS DOUBLE) / n_contained >= 0.95
              ORDER BY contained_id, container_id""")),

    QueryDef("x37_knn_classify",
      // kNN label vote over the exact top-5 neighbors; the argmax is a
      // max(struct) hash aggregate, not a window (ties -> smallest label)
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.where(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.knnClassify(emb, queries, "vec_id", "embedding", "label",
            "q_id", "q_vec", k = 5)
          .orderBy("query_id")
      },
      Some("""WITH sims AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_sum(list_transform(list_zip(q.embedding, c.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                  (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                   sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
                FROM embeddings q JOIN embeddings c
                  ON q.vec_id < 50 AND c.vec_id <> q.vec_id),
              ranked AS (
                SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims),
              votes AS (
                SELECT r.query_id, e.label, count(*) AS votes
                FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
                WHERE r.rank <= 5 GROUP BY 1, 2),
              best AS (
                SELECT query_id, label AS predicted_label, votes,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY votes DESC, label) AS rn
                FROM votes)
              SELECT query_id, predicted_label, votes
              FROM best WHERE rn = 1 ORDER BY query_id""")),

    QueryDef("x38_quota_cap",
      // per-domain quota (C4/RefinedWeb-style source cap): keep at
      // most k docs per source, selected by the smallest 52-bit md5
      // draws — a k-bounded TopKPairs aggregate, never a per-group
      // sort (13 hex chars = 52 bits so the double score is exact;
      // the oracle replays the draw bit-for-bit)
      (s, d) => Sampling.quotaCapPerGroup(documents(s, d), "source", "doc_id",
          k = 10)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
                SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT),
                      doc_id) AS rn
                FROM documents) t
              WHERE rn <= 10 ORDER BY doc_id""")),

    QueryDef("x39_chunking",
      // context-window prep: strided 50-token chunks with 10-token
      // overlap; the result row carries md5(chunk) instead of the
      // chunk text so the hash compare stays compact
      (s, d) => TextAnalysis.chunkDocs(documents(s, d), "doc_id", "text",
          chunkTokens = 50, stride = 40)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              s AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
              c AS (
                SELECT doc_id,
                  CAST(start AS INT) // 40 AS chunk_idx,
                  toks[CAST(start AS INT) + 1 : CAST(start AS INT) + 50] AS chunk
                FROM s, unnest(range(0, n, 40)) AS t(start))
              SELECT doc_id, chunk_idx,
                len(chunk) AS n_tokens,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
              FROM c ORDER BY doc_id, chunk_idx"""),
      headline = true),

    QueryDef("x40_oov_rate",
      // tokenizer-coverage signal: top-200-df vocabulary (ties to the
      // smallest term; Spark plans the sort+limit as a per-task
      // bounded heap via TakeOrderedAndProject), then per-doc
      // out-of-vocabulary occurrence rate against its broadcast
      (s, d) => {
        val docs = documents(s, d)
        val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text", v = 200)
        TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              terms AS (SELECT doc_id, unnest(toks) AS term FROM tk),
              df AS (SELECT term, count(DISTINCT doc_id) AS df
                     FROM terms GROUP BY 1),
              vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 200),
              j AS (SELECT t.doc_id, v.term AS hit
                    FROM terms t LEFT JOIN vocab v ON t.term = v.term)
              SELECT doc_id, count(*) AS n_tokens,
                count(*) FILTER (WHERE hit IS NULL) AS n_oov,
                CAST(count(*) FILTER (WHERE hit IS NULL) AS DOUBLE)
                  / count(*) AS oov_rate
              FROM j GROUP BY 1 ORDER BY doc_id""")),

    QueryDef("x42_boilerplate_rate",
      // corpus-duplication quality signal (the Gopher/FineWeb
      // duplicated-n-gram fraction): per doc, the share of its
      // DISTINCT bigrams whose corpus document frequency >= 3. Grams
      // travel as native md5-60 ShingleHashes longs — a collision-
      // negligible 60-bit hash of the string bigram: counts agree
      // exactly at test scale and statistically (birthday ~n²/2^61,
      // <1 colliding pair even at 10^9 distinct grams) at corpus
      // scale, with 8 bytes on the wire; the frequent-gram side is
      // df-filtered BEFORE the join back and left unhinted (AQE
      // broadcasts when small)
      (s, d) => TextAnalysis.boilerplateRate(documents(s, d), "doc_id", "text",
          n = 2, minDf = 3)
        .orderBy("doc_id"),
      // the oracle counts in STRING-bigram space — same distinct sets
      // by the md5-60 hash (exact at this scale; see boilerplateRate's
      // collision fine print) — including the short-doc padded gram
      // (a 1-token doc's gram is "tok,-1", which can never collide
      // with a real bigram: tokens are [a-z0-9]+ and contain no '-')
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              g AS (
                SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)), i ->
                    toks[CAST(i AS INT)] || ',' || toks[CAST(i AS INT) + 1])
                  ELSE [toks[1] || ',-1'] END) AS grams
                FROM tk WHERE len(toks) > 0),
              gr AS (SELECT doc_id, unnest(grams) AS gram FROM g),
              fq AS (SELECT gram FROM gr GROUP BY gram HAVING count(*) >= 3)
              SELECT gr.doc_id, count(*) AS n_grams,
                count(fq.gram) AS n_frequent,
                CAST(count(fq.gram) AS DOUBLE) / count(*) AS boilerplate_rate
              FROM gr LEFT JOIN fq ON gr.gram = fq.gram
              GROUP BY gr.doc_id ORDER BY gr.doc_id"""),
      headline = true),

    QueryDef("x43_rate_sample",
      // per-ROW-rate deterministic Bernoulli: survival probability is
      // a COLUMN (here length-proportional, clamped at 1) instead of a
      // per-stratum constant — the quality/length-weighted downsample.
      // Map-only scan; the salted md5 draw + floored threshold make
      // the survivor set a pure function of the data, replayable by
      // the oracle's integer arithmetic
      (s, d) => Sampling.deterministicSampleByRate(documents(s, d), "doc_id",
          least(lit(1.0), col("n_chars").cast("double") / 400.0), salt = "len")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
              WHERE CAST('0x' || substring(
                      md5('len:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000000
                  < CAST(floor(least(1.0, CAST(n_chars AS DOUBLE) / 400.0)
                      * 1000000) AS BIGINT)
              ORDER BY doc_id""")),

    QueryDef("x84_collocations",
      // top-k adjacent-bigram collocations by PMI lift — the
      // vocabulary/tokenizer-merge audit. Ranking by lift IS ranking
      // by PMI (log is monotone) and keeps the score an exact-integer
      // IEEE product, replayable where a log would hash-drift across
      // math libraries; minCount bounds the join to pairs that repeat
      (s, d) => TextAnalysis.collocations(documents(s, d),
          "doc_id", "text", k = 100, minCount = 5L),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              un AS (SELECT unnest(toks) AS term FROM tk),
              uc AS (SELECT term, count(*) AS c FROM un GROUP BY 1),
              n1t AS (SELECT count(*) AS n1 FROM un),
              bp AS (SELECT toks[CAST(i AS INT)] AS w1,
                       toks[CAST(i AS INT) + 1] AS w2
                     FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                           FROM tk WHERE len(toks) >= 2)),
              bc AS (SELECT w1, w2, count(*) AS c_xy FROM bp GROUP BY 1, 2),
              n2t AS (SELECT sum(c_xy) AS n2 FROM bc)
              SELECT w1, w2, c_xy, a.c AS c_x, b.c AS c_y,
                CAST(floor(1e6 * (CAST(c_xy AS DOUBLE) * n1 * n1)
                  / (CAST(a.c AS DOUBLE) * b.c * n2)) AS BIGINT) AS lift_ppm
              FROM bc
              JOIN uc a ON bc.w1 = a.term
              JOIN uc b ON bc.w2 = b.term, n1t, n2t
              WHERE c_xy >= 5
              ORDER BY lift_ppm DESC, w1, w2 LIMIT 100""")),

    QueryDef("x87_vocab_coverage",
      // the Zipf-curve audit: top-k terms by occurrence with
      // cumulative corpus share in floored integer ppm — how much of
      // the corpus the top k words cover (tokenizer budget / domain
      // shift). Rank + running sum window over the K-ROW result only;
      // the vocabulary itself never sorts globally
      (s, d) => TextAnalysis.vocabularyCoverage(documents(s, d),
          "doc_id", "text", k = 100),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              un AS (SELECT unnest(toks) AS term FROM tk),
              uc AS (SELECT term, count(*) AS c FROM un GROUP BY 1),
              nt AS (SELECT count(*) AS n FROM un),
              tp AS (SELECT term, c FROM uc
                     ORDER BY c DESC, term LIMIT 100)
              SELECT row_number() OVER (ORDER BY c DESC, term) AS rank,
                term, c,
                CAST((sum(c) OVER (ORDER BY c DESC, term
                   ROWS UNBOUNDED PRECEDING) * 1000000) // n
                  AS BIGINT) AS cum_ppm
              FROM tp, nt
              ORDER BY rank""")),

    QueryDef("x73_measured_mixture",
      // "mix what you have toward what you want": per-source sampling
      // rates computed from the corpus's own MEASURED token state
      // against a target token distribution (src0 asks for 60% of a
      // 3000-token budget — more than it has, so it clips at 1e6 and
      // the shortfall is visible; untargeted sources rate 0 and drop).
      // rate_ppm = min(1e6, floor(budget·target_ppm / tokens)) — the
      // two 1e6 factors cancel into ONE exact integer division; the
      // apply side is the map-only ppm draw (no double round-trip:
      // ppm/1e6 through a double can floor to ppm-1)
      (s, d) => Sampling.sampleToTokenTarget(documents(s, d),
          "source", "doc_id", "text",
          targetsPpm = Map("src0" -> 600000L, "src1" -> 200000L,
            "src2" -> 100000L, "src3" -> 100000L),
          budgetTokens = 3000L, salt = "mix73")
        .select(col("doc_id"), col("source"), col("rate_ppm"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, source,
                  list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> '') AS toks
                FROM documents),
              tok AS (
                SELECT source, coalesce(sum(len(toks)), 0) AS total_tokens
                FROM t GROUP BY source),
              tgt AS (
                SELECT * FROM (VALUES ('src0', 600000), ('src1', 200000),
                  ('src2', 100000), ('src3', 100000)) v(source, tppm)),
              rates AS (
                SELECT tok.source,
                  CASE WHEN total_tokens <= 0 THEN 0
                  ELSE least(1000000, CAST((3000 * CAST(tppm AS HUGEINT))
                    // CAST(total_tokens AS HUGEINT) AS BIGINT)) END AS rate_ppm
                FROM tok JOIN tgt ON tgt.source = tok.source)
              SELECT d.doc_id, d.source, r.rate_ppm
              FROM documents d JOIN rates r ON r.source = d.source
              WHERE CAST('0x' || substring(
                      md5('mix73:' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000000
                  < r.rate_ppm
              ORDER BY d.doc_id""")),

    QueryDef("x44_chunk_dedup",
      // C4-style duplicated-PASSAGE removal at chunk granularity:
      // non-overlapping 3-token chunks, each distinct chunk keeps its
      // first (doc_id, chunk_idx) occurrence corpus-wide, documents
      // reassemble from the survivors. First-occurrence pick is a
      // min-of-struct hash agg on the chunk md5 (map-side combine,
      // never a corpus window); reassembly state is bounded by each
      // doc's own size
      (s, d) => Dedup.dedupChunksKeepFirst(documents(s, d), "doc_id", "text",
          chunkTokens = 3)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              st AS (
                SELECT doc_id, toks,
                  unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS ci
                FROM tk WHERE len(toks) > 0),
              ch AS (
                SELECT doc_id, ci AS chunk_idx,
                  array_to_string(list_slice(toks, CAST(ci * 3 + 1 AS INT),
                    CAST(least((ci + 1) * 3, len(toks)) AS INT)), ' ') AS chunk_text
                FROM st),
              fi AS (
                SELECT doc_id, chunk_idx, chunk_text, row_number() OVER (
                  PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rk
                FROM ch)
              SELECT doc_id, count(*) AS n_chunks_kept,
                string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_deduped
              FROM fi WHERE rk = 1
              GROUP BY doc_id ORDER BY doc_id"""),
      // r6 verdict item 6: the heaviest new operator (chunk fan-out,
      // two shuffles, per-doc reassembly) must be bench-visible
      headline = true),

    QueryDef("x45_quantile_bucket",
      // length-quartile stratification WITHOUT a global sort: a 1-row
      // exact-percentile aggregate broadcasts into a map-only bucket
      // comparison (ntile would sort the corpus and break ties by
      // physical row order). exact=true here so DuckDB quantile_cont
      // replays the interpolated thresholds; the 100 TB path flips to
      // the approx_percentile sketch (spec pins them equal at this
      // scale)
      (s, d) => Sampling.quantileBuckets(documents(s, d), "n_chars",
          buckets = 4, exact = true)
        .select("doc_id", "n_chars", "bucket")
        .orderBy("doc_id"),
      Some("""WITH th AS (
                SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS t
                FROM documents)
              SELECT doc_id, n_chars,
                1 + CAST(n_chars > t[1] AS INT) + CAST(n_chars > t[2] AS INT)
                  + CAST(n_chars > t[3] AS INT) AS bucket
              FROM documents, th ORDER BY doc_id""")),

    QueryDef("x88_bpe_train",
      // learn a BPE merge table from the corpus: ONE corpus scan into
      // the word-frequency state, then every merge round runs on the
      // vocab table only (merges-so-far applied as a codegen'd
      // nested-replace projection — no iterative lineage); top-1 pair
      // per round is a bounded limit(1) heap; all counts exact Longs
      // so the k merges replay bit-for-bit in the oracle's chained CTEs
      (s, d) => Bpe.mergeTable(s,
        Bpe.train(Bpe.wordState(documents(s, d), "text"), merges = 8)),
      Some(bpeOracle(8, """SELECT * FROM (""" +
        (1 to 8).map(i =>
          s"SELECT CAST($i AS INT) AS rank, l, r, l || r AS merged, c AS pair_count FROM m$i")
          .mkString("\n                UNION ALL ") +
        """) ORDER BY rank""")),
      // the flagship r8 operator: an ITERATIVE multi-job op (8 bounded
      // collect rounds over the vocab state) — bench-track the whole
      // training loop, not just one round
      headline = true),

    QueryDef("x89_bpe_segment",
      // segment the corpus under the merges just learned from it:
      // per-doc word count + TRUE BPE token count. The replace chain
      // runs once per DISTINCT word (the dictionary trick), joined
      // back UNHINTED (AQE broadcasts a small vocabulary, degrades to
      // a shuffled hash join at web scale); zero-token docs emit no row
      (s, d) => {
        val docs = documents(s, d)
        val merges = Bpe.train(Bpe.wordState(docs, "text"), merges = 8)
        Bpe.segmentCounts(docs, "doc_id", "text", merges).orderBy("doc_id")
      },
      Some(bpeOracle(8,
        """SELECT un.doc_id, count(*) AS n_words,
                  CAST(sum(len(string_split(substring(w.sym, 2, length(w.sym) - 2),
                    '||'))) AS BIGINT) AS n_bpe_tokens
                FROM un JOIN w8 w ON un.word = w.word
                GROUP BY 1 ORDER BY doc_id"""))),

    QueryDef("x90_bpe_grow",
      // the tokenizer-training state is MERGEABLE: word-frequency
      // states built per intake batch sum into the corpus state, and
      // training from the grown state IS one-shot training on the
      // concatenated corpus (exact — training reads only exact Long
      // counts). The oracle replays the ONE-SHOT derivation; the
      // engine runs the grown path, so the equality is the check
      (s, d) => {
        val docs = documents(s, d)
        val a = Bpe.wordState(docs.where(col("doc_id") % 2 === 0), "text")
        val b = Bpe.wordState(docs.where(col("doc_id") % 2 === 1), "text")
        Bpe.mergeTable(s, Bpe.train(Bpe.mergeWordStates(Seq(a, b)), merges = 8))
      },
      Some(bpeOracle(8, """SELECT * FROM (""" +
        (1 to 8).map(i =>
          s"SELECT CAST($i AS INT) AS rank, l, r, l || r AS merged, c AS pair_count FROM m$i")
          .mkString("\n                UNION ALL ") +
        """) ORDER BY rank"""))),

    QueryDef("x91_bpe_stats",
      // tokenizer-fit audit FROM THE STATE: every corpus total is an
      // exact Long recoverable from (word, freq) alone, so the
      // compression numbers (chars/token, tokens/word) cost a
      // vocab-sized aggregate — the corpus is never re-scanned after
      // the one wordState pass. Floored integer ppm replays exactly
      (s, d) => {
        val st = Bpe.wordState(documents(s, d), "text")
        Bpe.segmentStats(st, Bpe.train(st, merges = 8))
      },
      Some(bpeOracle(8,
        """SELECT CAST(count(*) AS BIGINT) AS vocab_words,
                  CAST(sum(freq) AS BIGINT) AS total_words,
                  CAST(sum(freq * length(word)) AS BIGINT) AS total_chars,
                  CAST(sum(freq * len(string_split(
                    substring(sym, 2, length(sym) - 2), '||'))) AS BIGINT)
                    AS total_bpe_tokens,
                  CAST(sum(freq * length(word)) AS BIGINT) * 1000000
                    // CAST(sum(freq * len(string_split(
                      substring(sym, 2, length(sym) - 2), '||'))) AS BIGINT)
                    AS chars_per_token_ppm,
                  CAST(sum(freq * len(string_split(
                    substring(sym, 2, length(sym) - 2), '||'))) AS BIGINT)
                    * 1000000 // CAST(sum(freq) AS BIGINT)
                    AS tokens_per_word_ppm
                FROM w8"""))),

    QueryDef("x92_heavy_keys",
      // skew preflight: the measurement that decides whether a join
      // needs salting (x28's mechanism) BEFORE it runs — top-k
      // heaviest key values with exact corpus share and load vs a
      // uniform key. One hash agg → 1-row totals broadcast → bounded
      // top-k heap → rank window over the k-row result only
      (s, d) => SkewJoin.heavyKeys(
        events(s, d).select("user_id"), "user_id", k = 20),
      Some("""WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
              t AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS k FROM c),
              tp AS (SELECT user_id, c FROM c ORDER BY c DESC, user_id LIMIT 20)
              SELECT row_number() OVER (ORDER BY c DESC, user_id) AS rank,
                user_id, c,
                c * 1000000 // n AS share_ppm,
                c * k * 1000000 // n AS skew_ppm
              FROM tp, t ORDER BY rank""")),

    QueryDef("x93_table_profile",
      // ANALYZE-style stats in ONE pass: a single wide aggregate
      // (multi-distinct via Expand — k+1 streams over one scan, one
      // shuffle) unpivoted to a row per column. Exact NDV here so the
      // oracle replays; the 100 TB path flips exact=false for the HLL
      // sketch. Long/string columns only — float/timestamp string
      // forms are engine-specific
      (s, d) => TableProfile.profile(orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
      Some("""WITH a AS (SELECT count(*) AS n,
                count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS d1,
                  CAST(min(o_orderkey) AS VARCHAR) AS mn1,
                  CAST(max(o_orderkey) AS VARCHAR) AS mx1,
                count(o_custkey) AS c2, count(DISTINCT o_custkey) AS d2,
                  CAST(min(o_custkey) AS VARCHAR) AS mn2,
                  CAST(max(o_custkey) AS VARCHAR) AS mx2,
                count(o_orderstatus) AS c3, count(DISTINCT o_orderstatus) AS d3,
                  min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
                count(o_orderpriority) AS c4, count(DISTINCT o_orderpriority) AS d4,
                  min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4
              FROM orders)
              SELECT col_name, n_rows, n_nulls, ndv, min_val, max_val FROM (
                SELECT 'o_orderkey' AS col_name, n AS n_rows, n - c1 AS n_nulls,
                  d1 AS ndv, mn1 AS min_val, mx1 AS max_val FROM a
                UNION ALL SELECT 'o_custkey', n, n - c2, d2, mn2, mx2 FROM a
                UNION ALL SELECT 'o_orderstatus', n, n - c3, d3, mn3, mx3 FROM a
                UNION ALL SELECT 'o_orderpriority', n, n - c4, d4, mn4, mx4 FROM a)
              ORDER BY col_name""")),

    QueryDef("x94_bpe_pack",
      // the mix budget in REAL tokens: pack sequences by the learned
      // tokenizer's own counts (x89) instead of the whitespace proxy —
      // same chunked-prefix-sum packing algebra as x30 (8 bounded
      // windows, never a global sort), fed by the dictionary
      // segmentation
      (s, d) => {
        val docs = documents(s, d)
        val merges = Bpe.train(Bpe.wordState(docs, "text"), merges = 8)
        Sampling.packSequences(
            Bpe.segmentCounts(docs, "doc_id", "text", merges)
              .select("doc_id", "n_bpe_tokens"),
            "doc_id", "n_bpe_tokens", budget = 512, epoch = 1, chunks = 8)
          .select(col("doc_id"), col("n_bpe_tokens"), col("chunk"),
            col("seq"), col("start_off"))
          .orderBy("doc_id")
      },
      Some(bpeOracle(8,
        """, ds AS (
                SELECT un.doc_id,
                  CAST(sum(len(string_split(substring(w.sym, 2, length(w.sym) - 2),
                    '||'))) AS BIGINT) AS n_bpe_tokens
                FROM un JOIN w8 w ON un.word = w.word GROUP BY 1),
              k2 AS (
                SELECT doc_id, n_bpe_tokens,
                  CAST('0x' || substring(md5(
                    '1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
                FROM ds),
              o AS (
                SELECT doc_id, n_bpe_tokens, CAST(key % 8 AS INT) AS chunk,
                  SUM(n_bpe_tokens) OVER (PARTITION BY key % 8 ORDER BY key, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_bpe_tokens AS start_off
                FROM k2)
              SELECT doc_id, n_bpe_tokens, chunk,
                CAST(floor(CAST(start_off AS DOUBLE) / 512) AS BIGINT) AS seq,
                CAST(start_off AS BIGINT) AS start_off
              FROM o ORDER BY doc_id"""))),

    QueryDef("x95_bpe_retrain_audit",
      // the retrain decision: the corpus grew (old slice -> full),
      // the shipped tokenizer is frozen — inflation_ppm measures the
      // context-budget tax of NOT retraining (current state segmented
      // under old vs fresh merges; all vocab-sized state jobs). The
      // oracle re-derives BOTH trainings and the cross-application
      (s, d) => {
        val docs = documents(s, d)
        Bpe.retrainAudit(
          Bpe.wordState(docs.where(col("doc_id") < 250), "text"),
          Bpe.wordState(docs, "text"),
          merges = 8)
      },
      Some(x95Oracle)),

    QueryDef("x96_vocab_novelty",
      // intake early-warning: the arriving batch's genuinely new
      // vocabulary vs the grown word state, as distinct-word and
      // occurrence-mass ppm — novelty spikes precede the x95 token
      // tax. Batch-sized wordState + one unhinted left join; the
      // corpus never re-scans
      (s, d) => {
        val docs = documents(s, d)
        Bpe.noveltyAudit(
          Bpe.wordState(docs.where(col("doc_id") < 250), "text"),
          docs.where(col("doc_id") >= 250), "text")
      },
      Some("""WITH tk AS (
                SELECT doc_id, list_filter(string_split(
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '') AS toks
                FROM documents),
              un AS (SELECT doc_id, unnest(toks) AS word FROM tk),
              sw AS (SELECT DISTINCT word FROM un WHERE doc_id < 250),
              bw AS (SELECT word, count(*) AS freq FROM un
                     WHERE doc_id >= 250 GROUP BY 1),
              j AS (SELECT bw.word, freq, sw.word IS NOT NULL AS seen
                    FROM bw LEFT JOIN sw ON bw.word = sw.word)
              SELECT CAST(count(*) AS BIGINT) AS batch_vocab,
                CAST(count(CASE WHEN NOT seen THEN 1 END) AS BIGINT) AS new_vocab,
                CAST(sum(freq) AS BIGINT) AS batch_words,
                CAST(coalesce(sum(CASE WHEN NOT seen THEN freq END), 0)
                  AS BIGINT) AS new_words,
                CAST(count(CASE WHEN NOT seen THEN 1 END) AS BIGINT)
                  * 1000000 // CAST(count(*) AS BIGINT) AS vocab_novelty_ppm,
                CAST(coalesce(sum(CASE WHEN NOT seen THEN freq END), 0)
                  AS BIGINT)
                  * 1000000 // CAST(sum(freq) AS BIGINT) AS word_novelty_ppm
              FROM j""")),

    QueryDef("x97_lm_score",
      // the CCNet perplexity filter in exact algebra: per-doc negative
      // log-likelihood under the corpus's OWN hashed bag-of-ngrams
      // model (x77 state machinery) — low mean = templated text, high
      // = unseen noise, keep the middle band. Per-bucket nll rounded
      // ONCE to Long micro-nats; per-doc scores are exact integer
      // sums; the only corpus-sized shuffle is the per-doc hash agg
      (s, d) => {
        val docs = documents(s, d)
        val st = Sampling.dsirState(docs, "text", buckets = 1024,
          salt = "dsir")
        Sampling.lmScores(docs, Sampling.lmModelFromState(st, 1024),
            "doc_id", "text", buckets = 1024, salt = "dsir")
          .select("doc_id", "lang", "source", "nll_unats", "n_feats",
            "mean_nll_unats")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, lang, source,
                  coalesce(list_filter(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                    x -> x <> ''), CAST([] AS VARCHAR[])) AS toks
                FROM documents),
              f AS (
                SELECT doc_id, unnest(list_concat(toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]))) AS feat
                FROM t),
              fb AS (
                SELECT doc_id,
                  CAST('0x' || substring(md5('dsir:' || feat), 1, 15) AS BIGINT)
                    % 1024 AS bucket
                FROM f),
              rf AS (SELECT bucket, count(*) AS c FROM fb GROUP BY 1),
              tot AS (SELECT coalesce(sum(c), 0) AS tt FROM rf),
              model AS (
                SELECT bucket,
                  CAST(round(1000000.0 * (ln(tt + 1024) - ln(c + 1)))
                    AS BIGINT) AS nll
                FROM rf CROSS JOIN tot),
              sc AS (
                SELECT fb.doc_id, CAST(sum(m.nll) AS BIGINT) AS s,
                  count(*) AS nf
                FROM fb JOIN model m USING (bucket) GROUP BY 1)
              SELECT d.doc_id, d.lang, d.source,
                coalesce(s, 0) AS nll_unats,
                coalesce(nf, 0) AS n_feats,
                CASE WHEN coalesce(nf, 0) = 0 THEN NULL
                  ELSE coalesce(s, 0) // nf END AS mean_nll_unats
              FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
              ORDER BY d.doc_id""")),

    QueryDef("x98_outlier_fences",
      // per-group IQR outlier audit (the Tukey fences): exact
      // interpolated quartiles (the x45-validated percentile parity)
      // → fence arithmetic in the SAME operation order both sides →
      // outlier counts against the RAW fences; fences emitted rounded.
      // The fence frame is group-count-sized (AQE broadcasts it)
      (s, d) => {
        val o = orders(s, d)
        val q = o.groupBy("o_orderpriority").agg(
            percentile(col("o_totalprice"), lit(0.25)).as("__q1"),
            percentile(col("o_totalprice"), lit(0.75)).as("__q3"))
          .select(col("o_orderpriority"),
            (col("__q1") - (col("__q3") - col("__q1")) * lit(1.5)).as("__lo"),
            (col("__q3") + (col("__q3") - col("__q1")) * lit(1.5)).as("__hi"))
        o.join(q, Seq("o_orderpriority"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_totalprice") < col("__lo"), 1L).otherwise(0L))
              .as("n_low"),
            sum(when(col("o_totalprice") > col("__hi"), 1L).otherwise(0L))
              .as("n_high"),
            round(first(col("__lo")), 4).as("lo_fence"),
            round(first(col("__hi")), 4).as("hi_fence"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH q AS (
                SELECT o_orderpriority,
                  quantile_cont(o_totalprice, 0.25) AS q1,
                  quantile_cont(o_totalprice, 0.75) AS q3
                FROM orders GROUP BY 1),
              f AS (
                SELECT o_orderpriority,
                  q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
                FROM q)
              SELECT o.o_orderpriority, count(*) AS n,
                CAST(sum(CASE WHEN o.o_totalprice < lo THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_low,
                CAST(sum(CASE WHEN o.o_totalprice > hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_high,
                round(any_value(lo), 4) AS lo_fence,
                round(any_value(hi), 4) AS hi_fence
              FROM orders o JOIN f USING (o_orderpriority)
              GROUP BY 1 ORDER BY 1""")),

    QueryDef("x99_join_size",
      // join-size preflight on the self-join every engine fears: the
      // exact output cardinality lineitem ⋈ lineitem on l_partkey
      // WOULD produce (Σ c², quadratic per key), from two key hash
      // aggs and a key-count-sized join — the actual join never runs.
      // max_key says whether one hot key owns the blow-up (salt it)
      (s, d) => SkewJoin.joinSizeEstimate(
        lineitem(s, d).select("l_partkey"),
        lineitem(s, d).select("l_partkey"), "l_partkey"),
      Some("""WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem
                         GROUP BY 1),
              j AS (SELECT a.l_partkey AS k,
                      CAST(a.c AS BIGINT) * b.c AS rows_
                    FROM c a JOIN c b ON a.l_partkey = b.l_partkey)
              SELECT CAST(coalesce(sum(rows_), 0) AS BIGINT) AS join_rows,
                count(*) AS matched_keys,
                CAST(coalesce(max(rows_), 0) AS BIGINT) AS max_key_rows,
                (SELECT k FROM j ORDER BY rows_ DESC, k DESC LIMIT 1)
                  AS max_key
              FROM j""")),

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

    QueryDef("x122_zorder_skipping",
      // Z-ORDER data skipping, MEASURED (r11): the Morton curve of
      // (partkey mod 4096, suppkey mod 4096) — 32 codegen'd shift/
      // mask/or terms, no UDF — bucketed by fixed z-prefix (the
      // deterministic stand-in for range-clustered files), per-bucket
      // min/max on both dims (exactly parquet footer stats), and the
      // count of buckets a box query [512,1023]² cannot prune,
      // side by side with the single-dim sorted layout at the same
      // granularity. The layout decision in one row pair: z-order
      // reads a few boundary cells, the linear layout reads every
      // stripe the x-range admits (y stats prune nothing there). The
      // oracle replays the interleave as a 16-term bit sum
      (s, d) => ZOrder.skippingAudit(lineitem(s, d),
          col("l_partkey") % 4096, col("l_suppkey") % 4096,
          zShift = 16, linShift = 4,
          xLo = 512, xHi = 1023, yLo = 512, yHi = 1023)
        .orderBy("layout"),
      Some("""WITH pts AS (
                SELECT l_partkey % 4096 AS x, l_suppkey % 4096 AS y
                FROM lineitem),
              pairs AS (SELECT DISTINCT x, y FROM pts),
              zz AS (
                SELECT x, y,
                  CAST(sum((((x >> i.i) & 1) << (2 * i.i))
                     + (((y >> i.i) & 1) << (2 * i.i + 1))) AS BIGINT) AS zv
                FROM pairs, range(0, 16) i(i) GROUP BY x, y),
              withz AS (SELECT p.x, p.y, zz.zv
                        FROM pts p JOIN zz USING (x, y)),
              zb AS (SELECT zv >> 16 AS b,
                  min(x) AS minx, max(x) AS maxx,
                  min(y) AS miny, max(y) AS maxy
                FROM withz GROUP BY 1),
              lb AS (SELECT x >> 4 AS b,
                  min(x) AS minx, max(x) AS maxx,
                  min(y) AS miny, max(y) AS maxy
                FROM pts GROUP BY 1),
              zread AS (SELECT 'zorder' AS layout,
                  CAST(count(*) AS BIGINT) AS n_buckets,
                  CAST(coalesce(sum(CASE WHEN minx <= 1023 AND maxx >= 512
                      AND miny <= 1023 AND maxy >= 512
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_read
                FROM zb),
              lread AS (SELECT 'linear' AS layout,
                  CAST(count(*) AS BIGINT) AS n_buckets,
                  CAST(coalesce(sum(CASE WHEN minx <= 1023 AND maxx >= 512
                      AND miny <= 1023 AND maxy >= 512
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_read
                FROM lb)
              SELECT layout, n_buckets, n_read,
                n_read * 1000000 // n_buckets AS read_ppm
              FROM (SELECT * FROM zread UNION ALL SELECT * FROM lread)
              ORDER BY layout""")),

    QueryDef("x124_gif_resize",
      // GIF → resize → PNG TRANSCODE end to end (r11): real GIFs
      // (genuine LZW) → full LZW decode → nearest-neighbor resample →
      // real PNG re-encode → decoded AGAIN by pngPixelStats. One
      // chain crosses BOTH real codecs — any defect in either
      // container's decode/encode or the resample breaks the sums.
      // Oracle: resized pixel (x,y) of gif id is
      // (id·29 + (x·w div 8)·11 + (y·h div 6)·17) mod 256
      (s, d) => Multimodal.pngPixelStats(s,
          Multimodal.resizeImage(s,
            Multimodal.packRealGifs(s, documents(s, d)
              .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"),
            w = 8, h = 6))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, doc_id % 14 + 4 AS w,
                  (doc_id * 5) % 10 + 4 AS h
                FROM documents WHERE doc_id < 500),
              px AS (
                SELECT id,
                  (id * 29 + ((x.x * w) // 8) * 11
                     + ((y.y * h) // 6) * 17) % 256 AS v
                FROM imgs, range(0, 8) x(x), range(0, 6) y(y))
              SELECT id AS media_id, CAST(8 AS BIGINT) AS width,
                CAST(6 AS BIGINT) AS height,
                count(*) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM px GROUP BY 1 ORDER BY media_id""")),

    QueryDef("x125_pq_codes",
      // PRODUCT QUANTIZATION, the encoding half (r11): seeded
      // deterministic codebooks (8 subspaces × 16 codewords — integer
      // means of the ×1000-quantized seed groups, the IVF centroid
      // rule applied per subspace), every vector encoded to its 8
      // exact-integer argmin codes (ties to the lower code) — the
      // 8-byte representation that makes a 100 TB vector corpus fit
      // an ANN tier. Output pins the FULL assignment: per (subspace,
      // code), the member count and the id sum — any codebook or
      // argmin defect shifts a cell. The oracle re-derives codebooks
      // and every code from the raw embeddings
      (s, d) => {
        val emb = embeddings(s, d)
        val cb = Pq.trainSeeded(emb, "vec_id", "embedding",
          m = 8, ncode = 16)
        emb.select(col("vec_id"),
            posexplode(Pq.encode(col("embedding"), cb)).as(Seq("s", "c")))
          .groupBy("s", "c")
          .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("sum_ids"))
          .orderBy("s", "c")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cw AS (
                SELECT CAST((t.d - 1) // 8 AS INT) AS s,
                  CAST(vec_id % 16 AS INT) AS c, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS w
                FROM q, range(1, 65) t(d) GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT q.vec_id, cw.s, cw.c,
                  sum((q.qv[cw.d] - cw.w) * (q.qv[cw.d] - cw.w)) AS d2
                FROM q, cw GROUP BY 1, 2, 3),
              enc AS (
                SELECT vec_id, s, c FROM (
                  SELECT vec_id, s, c, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c) AS rn
                  FROM enc0)
                WHERE rn = 1)
              SELECT s, c, CAST(count(*) AS BIGINT) AS n_vecs,
                CAST(sum(vec_id) AS BIGINT) AS sum_ids
              FROM enc GROUP BY 1, 2 ORDER BY s, c""")),

    QueryDef("x126_pq_adc",
      // PQ ADC search (r11): per query one 8×16 exact-integer
      // distance table (query subvector vs codeword), a corpus row's
      // approximate distance = 8 table lookups summed — the vectors
      // are never read at search time, only the 8-code relation. The
      // full top-5 ranking (ties by id) replays externally
      (s, d) => {
        val emb = embeddings(s, d)
        val cb = Pq.trainSeeded(emb, "vec_id", "embedding",
          m = 8, ncode = 16)
        Pq.topKAdc(emb, "vec_id", "embedding",
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            cb, k = 5)
          .orderBy("qid", "rk")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cw AS (
                SELECT CAST((t.d - 1) // 8 AS INT) AS s,
                  CAST(vec_id % 16 AS INT) AS c, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS w
                FROM q, range(1, 65) t(d) GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT q.vec_id, cw.s, cw.c,
                  sum((q.qv[cw.d] - cw.w) * (q.qv[cw.d] - cw.w)) AS d2
                FROM q, cw GROUP BY 1, 2, 3),
              enc AS (
                SELECT vec_id, s, c FROM (
                  SELECT vec_id, s, c, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c) AS rn
                  FROM enc0)
                WHERE rn = 1),
              dt AS (
                SELECT qq.vec_id AS qid, cw.s, cw.c,
                  sum((qq.qv[cw.d] - cw.w) * (qq.qv[cw.d] - cw.w)) AS dist
                FROM q qq, cw WHERE qq.vec_id < 20 GROUP BY 1, 2, 3),
              adc AS (
                SELECT dt.qid, e.vec_id AS id, sum(dt.dist) AS adc
                FROM enc e JOIN dt ON dt.s = e.s AND dt.c = e.c
                GROUP BY 1, 2),
              ranked AS (SELECT qid, id, adc, row_number() OVER (
                  PARTITION BY qid ORDER BY adc, id) AS rk FROM adc)
              SELECT qid, CAST(rk AS INT) AS rk, id,
                CAST(adc AS BIGINT) AS adc
              FROM ranked WHERE rk <= 5 ORDER BY qid, rk""")),

    QueryDef("x127_pq_recall",
      // the PQ tier's MEASURED loss (the x62/x113 discipline): ADC
      // top-5 vs the exact integer-L2 top-5 on the same queries, one
      // row (k, n_queries, n_hits, recall_ppm) — the number a caller
      // reads before trusting 8-byte codes with a retrieval stage.
      // Both rankings are deterministic (ties by id) so the oracle
      // re-derives the recall exactly
      (s, d) => {
        val emb = embeddings(s, d)
        val cb = Pq.trainSeeded(emb, "vec_id", "embedding",
          m = 8, ncode = 16)
        Pq.recallAudit(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 50), "vec_id", "embedding",
          cb, k = 5)
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cw AS (
                SELECT CAST((t.d - 1) // 8 AS INT) AS s,
                  CAST(vec_id % 16 AS INT) AS c, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS w
                FROM q, range(1, 65) t(d) GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT q.vec_id, cw.s, cw.c,
                  sum((q.qv[cw.d] - cw.w) * (q.qv[cw.d] - cw.w)) AS d2
                FROM q, cw GROUP BY 1, 2, 3),
              enc AS (
                SELECT vec_id, s, c FROM (
                  SELECT vec_id, s, c, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c) AS rn
                  FROM enc0)
                WHERE rn = 1),
              dt AS (
                SELECT qq.vec_id AS qid, cw.s, cw.c,
                  sum((qq.qv[cw.d] - cw.w) * (qq.qv[cw.d] - cw.w)) AS dist
                FROM q qq, cw WHERE qq.vec_id < 50 GROUP BY 1, 2, 3),
              adc AS (
                SELECT dt.qid, e.vec_id AS id, sum(dt.dist) AS adc
                FROM enc e JOIN dt ON dt.s = e.s AND dt.c = e.c
                GROUP BY 1, 2),
              apr AS (SELECT qid, id FROM (
                  SELECT qid, id, row_number() OVER (
                    PARTITION BY qid ORDER BY adc, id) AS rk FROM adc)
                WHERE rk <= 5),
              ex0 AS (
                SELECT a.vec_id AS qid, b.vec_id AS id,
                  CAST(sum((a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)])
                     * (a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)]))
                    AS BIGINT) AS d2
                FROM q a, q b, range(1, 65) t(d) WHERE a.vec_id < 50
                GROUP BY 1, 2),
              exr AS (SELECT qid, id FROM (
                  SELECT qid, id, row_number() OVER (
                    PARTITION BY qid ORDER BY d2, id) AS rk FROM ex0)
                WHERE rk <= 5),
              hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
                       FROM apr JOIN exr USING (qid, id)),
              nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
                     FROM q WHERE vec_id < 50)
              SELECT CAST(5 AS BIGINT) AS k, nq.n_queries, hits.n_hits,
                n_hits * 1000000 // (n_queries * 5) AS recall_ppm
              FROM hits, nq""")),

    QueryDef("x128_ivfpq_adc",
      // IVF-PQ (r11): the canonical billion-scale index shape — a
      // coarse quantizer routes each vector to a cell, PQ encodes the
      // RESIDUAL (vector − centroid), and a query probes nprobe cells
      // scoring only their rows by residual-ADC lookups. Everything
      // deterministic: seeded coarse centroids (the x110 rule), one
      // global residual codebook (seed groups over residuals), exact-
      // integer argmin encodings, and the pruning falls out of the
      // (cell, s, c) join key — no vector is read at search time. The
      // oracle replays centroids → assignment → residuals → codebook
      // → codes → probe ranking → ADC tables → the full top-5
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        val cb = Pq.trainSeededResiduals(emb, "vec_id", "embedding",
          cents, m = 8, ncode = 16)
        Pq.topKIvfPq(emb, "vec_id", "embedding",
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            cents, cb, k = 5, nprobe = 4)
          .orderBy("qid", "rk")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cent AS (
                SELECT vec_id % 16 AS cell, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS c
                FROM q, range(1, 65) t(d) GROUP BY 1, 2),
              dist AS (
                SELECT q.vec_id, ct.cell,
                  CAST(sum((q.qv[ct.d] - ct.c) * (q.qv[ct.d] - ct.c))
                    AS BIGINT) AS d2
                FROM q, cent ct GROUP BY 1, 2),
              asg AS (SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dist) WHERE rn = 1),
              res AS (
                SELECT q.vec_id, a.cell, ct.d, q.qv[ct.d] - ct.c AS rv
                FROM q JOIN asg a USING (vec_id)
                JOIN cent ct ON ct.cell = a.cell),
              rcw AS (
                SELECT CAST((r.d - 1) // 8 AS INT) AS s,
                  CAST(r.vec_id % 16 AS INT) AS c2, r.d,
                  CAST(floor(CAST(sum(r.rv) AS DOUBLE) / count(*) + 0.5)
                    AS BIGINT) AS w
                FROM res r GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT r.vec_id, r.cell, w.s, w.c2,
                  sum((r.rv - w.w) * (r.rv - w.w)) AS d2
                FROM res r JOIN rcw w ON w.d = r.d GROUP BY 1, 2, 3, 4),
              enc AS (SELECT vec_id, cell, s, c2 FROM (
                  SELECT vec_id, cell, s, c2, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c2) AS rn
                  FROM enc0) WHERE rn = 1),
              probe AS (SELECT vec_id AS qid, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dist WHERE vec_id < 20) WHERE rn <= 4),
              qres AS (
                SELECT p.qid, p.cell, ct.d, q.qv[ct.d] - ct.c AS rq
                FROM probe p JOIN q ON q.vec_id = p.qid
                JOIN cent ct ON ct.cell = p.cell),
              dt AS (
                SELECT qr.qid, qr.cell, w.s, w.c2,
                  sum((qr.rq - w.w) * (qr.rq - w.w)) AS dist
                FROM qres qr JOIN rcw w ON w.d = qr.d GROUP BY 1, 2, 3, 4),
              adc AS (
                SELECT dt.qid, e.vec_id AS id, sum(dt.dist) AS adc
                FROM enc e JOIN dt ON dt.cell = e.cell AND dt.s = e.s
                  AND dt.c2 = e.c2
                GROUP BY 1, 2),
              ranked AS (SELECT qid, id, adc, row_number() OVER (
                  PARTITION BY qid ORDER BY adc, id) AS rk FROM adc)
              SELECT qid, CAST(rk AS INT) AS rk, id,
                CAST(adc AS BIGINT) AS adc
              FROM ranked WHERE rk <= 5 ORDER BY qid, rk""")),

    QueryDef("x129_ivfpq_recall",
      // the IVF-PQ tier's measured loss: two approximations compound
      // (unprobed cells hide true neighbors; 8-byte residual codes
      // blur distances) — one row (k, n_queries, n_hits, recall_ppm)
      // against the exact integer ranking, the number that sizes
      // nprobe and ncode before the tier serves retrieval
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding",
          nlist = 16)
        val cb = Pq.trainSeededResiduals(emb, "vec_id", "embedding",
          cents, m = 8, ncode = 16)
        Pq.recallAuditIvfPq(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 50), "vec_id", "embedding",
          cents, cb, k = 5, nprobe = 4)
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cent AS (
                SELECT vec_id % 16 AS cell, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS c
                FROM q, range(1, 65) t(d) GROUP BY 1, 2),
              dist AS (
                SELECT q.vec_id, ct.cell,
                  CAST(sum((q.qv[ct.d] - ct.c) * (q.qv[ct.d] - ct.c))
                    AS BIGINT) AS d2
                FROM q, cent ct GROUP BY 1, 2),
              asg AS (SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dist) WHERE rn = 1),
              res AS (
                SELECT q.vec_id, a.cell, ct.d, q.qv[ct.d] - ct.c AS rv
                FROM q JOIN asg a USING (vec_id)
                JOIN cent ct ON ct.cell = a.cell),
              rcw AS (
                SELECT CAST((r.d - 1) // 8 AS INT) AS s,
                  CAST(r.vec_id % 16 AS INT) AS c2, r.d,
                  CAST(floor(CAST(sum(r.rv) AS DOUBLE) / count(*) + 0.5)
                    AS BIGINT) AS w
                FROM res r GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT r.vec_id, r.cell, w.s, w.c2,
                  sum((r.rv - w.w) * (r.rv - w.w)) AS d2
                FROM res r JOIN rcw w ON w.d = r.d GROUP BY 1, 2, 3, 4),
              enc AS (SELECT vec_id, cell, s, c2 FROM (
                  SELECT vec_id, cell, s, c2, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c2) AS rn
                  FROM enc0) WHERE rn = 1),
              probe AS (SELECT vec_id AS qid, cell FROM (
                  SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dist WHERE vec_id < 50) WHERE rn <= 4),
              qres AS (
                SELECT p.qid, p.cell, ct.d, q.qv[ct.d] - ct.c AS rq
                FROM probe p JOIN q ON q.vec_id = p.qid
                JOIN cent ct ON ct.cell = p.cell),
              dt AS (
                SELECT qr.qid, qr.cell, w.s, w.c2,
                  sum((qr.rq - w.w) * (qr.rq - w.w)) AS dist
                FROM qres qr JOIN rcw w ON w.d = qr.d GROUP BY 1, 2, 3, 4),
              adc AS (
                SELECT dt.qid, e.vec_id AS id, sum(dt.dist) AS adc
                FROM enc e JOIN dt ON dt.cell = e.cell AND dt.s = e.s
                  AND dt.c2 = e.c2
                GROUP BY 1, 2),
              apr AS (SELECT qid, id FROM (
                  SELECT qid, id, row_number() OVER (
                    PARTITION BY qid ORDER BY adc, id) AS rk FROM adc)
                WHERE rk <= 5),
              ex0 AS (
                SELECT a.vec_id AS qid, b.vec_id AS id,
                  CAST(sum((a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)])
                     * (a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)]))
                    AS BIGINT) AS d2
                FROM q a, q b, range(1, 65) t(d) WHERE a.vec_id < 50
                GROUP BY 1, 2),
              exr AS (SELECT qid, id FROM (
                  SELECT qid, id, row_number() OVER (
                    PARTITION BY qid ORDER BY d2, id) AS rk FROM ex0)
                WHERE rk <= 5),
              hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
                       FROM apr JOIN exr USING (qid, id)),
              nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
                     FROM q WHERE vec_id < 50)
              SELECT CAST(5 AS BIGINT) AS k, nq.n_queries, hits.n_hits,
                n_hits * 1000000 // (n_queries * 5) AS recall_ppm
              FROM hits, nq""")),

    QueryDef("x132_pq_rerank",
      // the PQ recall REPAIR, measured as a curve (r11): exact
      // re-ranking of the ADC top-R candidates (Jégou §V.C) — the
      // codes pick R candidates cheaply, only those R vectors are
      // re-scored exactly, recall climbs toward 1 as R grows while
      // vector reads stay (queries × R). One row per R beside x127's
      // raw-ADC floor: the operating-point table a caller reads to
      // size the rerank knob, replacing a silently-accepted 0.27
      (s, d) => {
        val emb = embeddings(s, d)
        val cb = Pq.trainSeeded(emb, "vec_id", "embedding",
          m = 8, ncode = 16)
        val qs = emb.where(col("vec_id") < 50)
        Seq(10, 25, 50, 100).map { r =>
          Pq.rerankRecallAudit(emb, "vec_id", "embedding",
              qs, "vec_id", "embedding", cb, k = 5, rerank = r)
            .withColumn("rerank", lit(r.toLong))
        }.reduce(_.unionByName(_))
          .select(col("rerank"), col("k"), col("n_queries"),
            col("n_hits"), col("recall_ppm"))
          .orderBy("rerank")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                  AS qv
                FROM embeddings),
              cw AS (
                SELECT CAST((t.d - 1) // 8 AS INT) AS s,
                  CAST(vec_id % 16 AS INT) AS c, CAST(t.d AS INT) AS d,
                  CAST(floor(CAST(sum(qv[CAST(t.d AS INT)]) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS w
                FROM q, range(1, 65) t(d) GROUP BY 1, 2, 3),
              enc0 AS (
                SELECT q.vec_id, cw.s, cw.c,
                  sum((q.qv[cw.d] - cw.w) * (q.qv[cw.d] - cw.w)) AS d2
                FROM q, cw GROUP BY 1, 2, 3),
              enc AS (SELECT vec_id, s, c FROM (
                  SELECT vec_id, s, c, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY d2, c) AS rn
                  FROM enc0) WHERE rn = 1),
              dt AS (
                SELECT qq.vec_id AS qid, cw.s, cw.c,
                  sum((qq.qv[cw.d] - cw.w) * (qq.qv[cw.d] - cw.w)) AS dist
                FROM q qq, cw WHERE qq.vec_id < 50 GROUP BY 1, 2, 3),
              adc AS (
                SELECT dt.qid, e.vec_id AS id, sum(dt.dist) AS adc
                FROM enc e JOIN dt ON dt.s = e.s AND dt.c = e.c
                GROUP BY 1, 2),
              ranked AS (SELECT qid, id, row_number() OVER (
                  PARTITION BY qid ORDER BY adc, id) AS rk FROM adc),
              ex0 AS (
                SELECT a.vec_id AS qid, b.vec_id AS id,
                  CAST(sum((a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)])
                     * (a.qv[CAST(t.d AS INT)] - b.qv[CAST(t.d AS INT)]))
                    AS BIGINT) AS d2
                FROM q a, q b, range(1, 65) t(d) WHERE a.vec_id < 50
                GROUP BY 1, 2),
              exr AS (SELECT qid, id FROM (
                  SELECT qid, id, row_number() OVER (
                    PARTITION BY qid ORDER BY d2, id) AS rk FROM ex0)
                WHERE rk <= 5),
              rr AS (SELECT CAST(unnest([10, 25, 50, 100]) AS BIGINT)
                  AS rerank),
              cand AS (SELECT rr.rerank, r.qid, r.id
                       FROM rr, ranked r WHERE r.rk <= rr.rerank),
              resc AS (SELECT c.rerank, c.qid, c.id, e.d2
                       FROM cand c JOIN ex0 e
                         ON e.qid = c.qid AND e.id = c.id),
              rr5 AS (SELECT rerank, qid, id FROM (
                  SELECT rerank, qid, id, row_number() OVER (
                    PARTITION BY rerank, qid ORDER BY d2, id) AS rk
                  FROM resc) WHERE rk <= 5),
              hits AS (SELECT rerank, CAST(count(*) AS BIGINT) AS n_hits
                       FROM rr5 JOIN exr USING (qid, id) GROUP BY 1),
              nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
                     FROM q WHERE vec_id < 50)
              SELECT rr.rerank, CAST(5 AS BIGINT) AS k, nq.n_queries,
                CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                coalesce(h.n_hits, 0) * 1000000
                  // (nq.n_queries * 5) AS recall_ppm
              FROM rr LEFT JOIN hits h USING (rerank), nq
              ORDER BY rr.rerank""")),

    QueryDef("x123_grouped_quantiles",
      // per-SOURCE quantile estimates in ONE bounded pass (r11, the
      // grouped twin of x119): every source's doc-length quartiles +
      // p90 from per-group bottom-k value samples built by the native
      // BottomKLongs partial aggregate — the per-slice distribution
      // profile ("is crawl B's length distribution shifted vs A's?")
      // without sorting any group, at ≤ G·k sketch rows total. The
      // oracle replays the sketch membership, the value pull-back,
      // and the rank selection exactly
      (s, d) => {
        val base = documents(s, d).where(col("text").isNotNull)
        val sk = Kmv.groupedValueSketch(base, col("source"),
          col("doc_id").cast("string"), length(col("text")), k = 128)
        Kmv.groupedQuantileEstimate(sk,
            Seq(250000L, 500000L, 900000L))
          .orderBy("g", "q_ppm")
      },
      Some("""WITH base AS (
                SELECT source AS g,
                  CAST('0x' || substring(md5(
                    'kmvq:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv,
                  CAST(length(text) AS BIGINT) AS v
                FROM documents WHERE text IS NOT NULL),
              sk0 AS (SELECT g, hv FROM (
                  SELECT g, hv, row_number() OVER (
                    PARTITION BY g ORDER BY hv) AS rn
                  FROM (SELECT DISTINCT g, hv FROM base))
                WHERE rn <= 128),
              sk AS (SELECT s.g, s.hv, min(b.v) AS v
                     FROM sk0 s JOIN base b USING (g, hv)
                     GROUP BY 1, 2),
              rk AS (SELECT g, v, row_number() OVER (
                  PARTITION BY g ORDER BY v, hv) AS rk FROM sk),
              ns AS (SELECT g, count(*) AS n FROM sk GROUP BY 1),
              qs AS (SELECT CAST(unnest([250000, 500000, 900000])
                  AS BIGINT) AS q_ppm),
              tgt AS (SELECT n.g, q.q_ppm,
                  (q.q_ppm * (n.n - 1)) // 1000000 + 1 AS rk
                FROM ns n, qs q)
              SELECT t.g AS g, t.q_ppm, r.v AS est_v
              FROM tgt t JOIN rk r ON r.g = t.g AND r.rk = t.rk
              ORDER BY t.g, t.q_ppm""")),

    QueryDef("x131_bmp_pixels",
      // REAL BMP pixel decode (r11, the fourth real-decode leg):
      // complete 24-bit BMPs synthesized from the doc ids, decoded
      // through the bottom-up padded-scanline walk, exact integer
      // stats computed. With BMP, every non-entropy-coded format the
      // sniffer knows decodes for real; the oracle replays the stats
      // as id algebra — a padding/row-order/BGR defect breaks the
      // sums bit-for-bit
      (s, d) => Multimodal.bmpPixelStats(s,
          Multimodal.packRealBmps(s, documents(s, d)
            .where(col("doc_id") < 500).select(col("doc_id")), "doc_id"))
        .orderBy(col("media_id")),
      Some("""WITH imgs AS (
                SELECT doc_id AS id, doc_id % 12 + 4 AS w,
                  (doc_id * 3) % 9 + 4 AS h
                FROM documents WHERE doc_id < 500),
              px AS (
                SELECT id, w, h,
                  (id * 23 + x.x * 13 + y.y * 19) % 256 AS v
                FROM imgs, range(0, 16) x(x), range(0, 13) y(y)
                WHERE x.x < w AND y.y < h)
              SELECT id AS media_id, w AS width, h AS height,
                count(*) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_pixels,
                CAST(max(v) AS BIGINT) AS max_pixel,
                CAST(count(*) FILTER (v > 127) AS BIGINT) AS n_bright
              FROM px GROUP BY 1, 2, 3 ORDER BY media_id""")),

    QueryDef("x119_kmv_quantiles",
      // KMV VALUE SAMPLE → quantile estimates (r11): the bottom-k-by-
      // key-hash rows keep the value column, forming a uniform row
      // sample whose order statistics estimate the population's —
      // the quantile leg of the sketch stack (distribution profiling
      // of doc lengths at 100 TB without a global sort; the sketch is
      // 256 rows). Estimator = lower order statistic at floored-ppm
      // rank, pure integer algebra. The house discipline: the exact
      // quantiles ride along and the measured error ships with the
      // estimate (err_ppm)
      (s, d) => {
        val base = documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id").cast("string").as("k"),
            length(col("text")).cast("long").as("v"))
        val qs = Seq(100000L, 250000L, 500000L, 750000L, 900000L)
        val est = Kmv.quantileEstimate(
          Kmv.valueSketch(base, col("k"), col("v"), k = 256), qs)
        // the audit tier: the same index algebra over the FULL
        // relation (one global sort — this is the measured-loss
        // oracle, not the serving path)
        val exact = Kmv.quantileEstimate(base, qs)
          .withColumnRenamed("est_v", "exact_v")
        est.join(exact, Seq("q_ppm"))
          .select(col("q_ppm"), col("est_v"), col("exact_v"),
            expr("""abs(est_v - exact_v) * CAST(1000000 AS BIGINT)
              DIV greatest(exact_v, CAST(1 AS BIGINT))""").as("err_ppm"))
          .orderBy("q_ppm")
      },
      Some("""WITH base AS (
                SELECT CAST('0x' || substring(md5(
                    'kmvq:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv,
                  CAST(length(text) AS BIGINT) AS v
                FROM documents WHERE text IS NOT NULL),
              sk AS (SELECT v FROM base ORDER BY hv, v LIMIT 256),
              qs AS (SELECT CAST(unnest([100000, 250000, 500000,
                  750000, 900000]) AS BIGINT) AS q_ppm),
              srk AS (SELECT v, row_number() OVER (ORDER BY v) AS rk
                      FROM sk),
              sn AS (SELECT count(*) AS n FROM sk),
              est AS (SELECT q.q_ppm, s.v AS est_v
                      FROM qs q, sn, srk s
                      WHERE s.rk = (q.q_ppm * (sn.n - 1)) // 1000000 + 1),
              erk AS (SELECT v, row_number() OVER (ORDER BY v) AS rk
                      FROM base),
              en AS (SELECT count(*) AS n FROM base),
              ex AS (SELECT q.q_ppm, e.v AS exact_v
                     FROM qs q, en, erk e
                     WHERE e.rk = (q.q_ppm * (en.n - 1)) // 1000000 + 1)
              SELECT est.q_ppm AS q_ppm, est_v, exact_v,
                abs(est_v - exact_v) * 1000000
                  // greatest(exact_v, 1) AS err_ppm
              FROM est JOIN ex ON est.q_ppm = ex.q_ppm
              ORDER BY q_ppm""")),

    QueryDef("x111_pca_moments",
      // distributed PCA, the corpus-scale half (r10): the exact
      // integer second-moment state of the ×1000-quantized embedding
      // corpus — n, per-dim sums, the Gram upper triangle — built by
      // per-partition Long accumulation (order-free, bit-identical
      // under any layout, model-sized: 2,145 longs for 64 dims). The
      // eigen/projection half consumes this state on the driver
      // (Pca.fit/project — spec-verified properties; doubles are not
      // hash-comparable). Output: the state's identifying cells,
      // every one an exact Long the oracle re-derives
      (s, d) => {
        val st = Pca.momentState(embeddings(s, d), "embedding")
        def gAt(i: Int, j: Int): Long = // (i,j) i<=j in the packed triangle
          st.g(i * st.dim - i * (i - 1) / 2 + (j - i))
        val trace = (0 until st.dim).map(i => gAt(i, i)).sum
        val sess = s
        import sess.implicits._
        Seq((st.n, st.dim, st.s(0), st.s(1), gAt(0, 0), gAt(0, 1), trace))
          .toDF("n", "dim", "s0", "s1", "g00", "g01", "g_trace")
      },
      Some("""WITH q AS (
                SELECT list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64)
              SELECT CAST(count(*) AS BIGINT) AS n, CAST(64 AS INT) AS dim,
                CAST(sum(qv[1]) AS BIGINT) AS s0,
                CAST(sum(qv[2]) AS BIGINT) AS s1,
                CAST(sum(qv[1] * qv[1]) AS BIGINT) AS g00,
                CAST(sum(qv[1] * qv[2]) AS BIGINT) AS g01,
                CAST(sum(list_sum(list_transform(qv, x -> x * x)))
                  AS BIGINT) AS g_trace
              FROM q""")),

    // ===================================== transactional tables (TxLog)
    QueryDef("x147_tx_snapshot",
      // the TRANSACTIONAL table layer (r12 — the residual gap the
      // Lease + `_current` pointer story left open): three concurrent-
      // safe APPEND commits land through the atomic manifest claim and
      // a snapshot-isolated read folds the log back to exactly the
      // union — every row byte-accounted via md5 against the source
      // table, so one lost/duplicated commit or misfolded manifest
      // diverges. The log is metadata-sized; data dirs are immutable
      // parquet the read plans directly
      (s, d) => {
        val root = freshTxRoot(s, "snap", d)
        val doc = txDocs(s, d)
        (0 until 3).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") % 3 === k), Some("doc_id")))
        TxLog.snapshot(s, root)
          .select(col("doc_id"), md5(col("text")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS digest
              FROM documents WHERE doc_id < 2000 ORDER BY doc_id""")),

    QueryDef("x148_tx_time_travel",
      // TIME TRAVEL: the same fold stopped at version 2 — the third
      // commit's rows must be invisible even though they are on disk.
      // Historical versions are first-class reads (audits, repro,
      // incremental consumers), not a recovery path
      (s, d) => {
        val root = freshTxRoot(s, "travel", d)
        val doc = txDocs(s, d)
        (0 until 3).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") % 3 === k), Some("doc_id")))
        TxLog.snapshot(s, root, asOf = Some(2))
          .select(col("doc_id"), md5(col("text")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS digest
              FROM documents WHERE doc_id < 2000 AND doc_id % 3 < 2
              ORDER BY doc_id""")),

    QueryDef("x149_tx_rewrite",
      // OPTIMISTIC REWRITE vs a mid-flight append: the rewrite reads
      // its snapshot, an APPEND commits underneath it (claim
      // collision), and the rewrite retries past it removing ONLY the
      // inputs it read — the interleaved append's rows survive next
      // to the filtered rewrite output. This is the compaction-vs-
      // ingest interleaving a multi-writer lake runs daily
      (s, d) => {
        val root = freshTxRoot(s, "rw", d)
        TxLog.append(s, root, txDocs(s, d), Some("doc_id"))
        TxLog.rewrite(s, root, Some("doc_id")) { snap =>
          TxLog.append(s, root,
            documents(s, d)
              .where(col("doc_id") >= 2000 && col("doc_id") < 2400)
              .select(col("doc_id"), col("text")), Some("doc_id"))
          snap.where(length(col("text")) >= 200)
        }
        TxLog.snapshot(s, root)
          .select(col("doc_id"), length(col("text")).as("n_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_len
              FROM documents
              WHERE (doc_id < 2000 AND length(text) >= 200)
                 OR (doc_id >= 2000 AND doc_id < 2400)
              ORDER BY doc_id""")),

    QueryDef("x150_tx_cdc",
      // CDC over the commit log: the row-level delta of versions
      // (1, 4] — the two later appends stream as inserts, the rewrite
      // as delete-all + re-insert of the filtered survivors (the
      // honest physical delta). Incremental consumers (downstream
      // index builds, the intake journeys) read THIS instead of
      // re-scanning the table
      (s, d) => {
        val root = freshTxRoot(s, "cdc", d)
        val doc = txDocs(s, d)
        (0 until 3).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") % 3 === k), Some("doc_id")))
        TxLog.rewrite(s, root, Some("doc_id"))(
          _.where(length(col("text")) >= 200))
        TxLog.changes(s, root, fromV = 1, toV = 4)
          .select(col("__version").as("version"),
            col("__change").as("change"), col("doc_id"))
          .orderBy("version", "change", "doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE doc_id < 2000)
              SELECT CAST(2 AS BIGINT) AS version, 'insert' AS change,
                doc_id FROM d WHERE doc_id % 3 = 1
              UNION ALL
              SELECT 3, 'insert', doc_id FROM d WHERE doc_id % 3 = 2
              UNION ALL
              SELECT 4, 'delete', doc_id FROM d
              UNION ALL
              SELECT 4, 'insert', doc_id FROM d WHERE length(text) >= 200
              ORDER BY version, change, doc_id""")),

    QueryDef("x151_tx_skipping",
      // MANIFEST-LEVEL FILE SKIPPING: each commit records min/max of
      // the key from the bytes it committed, and a [500, 900) range
      // read prunes whole data dirs BEFORE Spark plans the scan
      // (x122's z-order model one level up: the manifest skips dirs,
      // row groups skip pages below). Stat-less dirs (the empty
      // buckets at small SFs) can never be pruned and stay scanned —
      // the oracle replays the per-bucket stats AND the prune
      // decision from the raw table
      (s, d) => {
        val root = freshTxRoot(s, "skip", d)
        val doc = txDocs(s, d)
        (0 until 10).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") >= k * 200 && col("doc_id") < (k + 1) * 200),
          Some("doc_id")))
        TxLog.pruneAudit(s, root, "doc_id", 500, 900).orderBy("min_key")
      },
      Some("""WITH b AS (SELECT k.k AS k FROM range(0, 10) k(k)),
              g AS (SELECT doc_id // 200 AS k, count(*) AS c,
                      min(doc_id) AS mn, max(doc_id) AS mx
                    FROM documents WHERE doc_id < 2000 GROUP BY 1)
              SELECT coalesce(g.c, 0) AS n_rows, g.mn AS min_key,
                g.mx AS max_key,
                CASE WHEN g.mn IS NULL THEN true
                  ELSE g.mn < 900 AND g.mx >= 500 END AS scanned
              FROM b LEFT JOIN g ON b.k = g.k
              ORDER BY min_key""")),

    QueryDef("x155_tx_idempotent",
      // REPLAY-SAFE intake through the txn token (Delta's
      // SetTransaction pattern — the foreachBatch sink contract): the
      // middle batch is delivered TWICE (the crash-replay a streaming
      // producer actually does) and commits exactly once, so the
      // snapshot equals the plain union — byte-accounted via md5. The
      // replay's pre-written data dir is an invisible orphan vacuum
      // reclaims
      (s, d) => {
        val root = freshTxRoot(s, "idem", d)
        val doc = txDocs(s, d)
        (0 until 3).foreach { k =>
          TxLog.appendIdempotent(s, root,
            doc.where(col("doc_id") % 3 === k), "intake", k + 1L,
            Some("doc_id"))
          if (k == 1) TxLog.appendIdempotent(s, root, // the replay
            doc.where(col("doc_id") % 3 === k), "intake", k + 1L,
            Some("doc_id"))
        }
        TxLog.snapshot(s, root)
          .select(col("doc_id"), md5(col("text")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS digest
              FROM documents WHERE doc_id < 2000 ORDER BY doc_id""")),

    QueryDef("x156_tx_optimize",
      // OPTIMIZE with range re-clustering (the Delta OPTIMIZE
      // analogue, r12): arrival-order appends each span the whole key
      // range (id % 5 slices here), so manifest stats prune NOTHING —
      // one transactional rewrite re-clusters the snapshot into fixed-
      // width key buckets (one pass, one shuffle, each bucket its own
      // AddFile with tight min/max) and range reads prune again. The
      // oracle replays the bucket arithmetic (width = ceil(span/8))
      // and every stat + prune decision from the raw table
      (s, d) => {
        val root = freshTxRoot(s, "opt", d)
        val doc = txDocs(s, d)
        (0 until 5).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") % 5 === k), Some("doc_id")))
        TxLog.optimizeRange(s, root, "doc_id", buckets = 8)
        TxLog.pruneAudit(s, root, "doc_id", 500, 900).orderBy("min_key")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
              r AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM d),
              w AS (SELECT mn, greatest(1, (mx - mn + 8) // 8) AS width
                    FROM r),
              b AS (SELECT (doc_id - mn) // width AS k, doc_id
                    FROM d, w),
              g AS (SELECT k, count(*) AS c, min(doc_id) AS mnk,
                      max(doc_id) AS mxk
                    FROM b GROUP BY 1)
              SELECT c AS n_rows, mnk AS min_key, mxk AS max_key,
                (mnk < 900 AND mxk >= 500) AS scanned
              FROM g ORDER BY min_key""")),

    // ================================ learned classifier (Naive Bayes)
    QueryDef("x158_tx_history",
      // the table's own audit trail as DATA (DESCRIBE HISTORY): every
      // commit's action, add/remove footprint, committed rows, and
      // producer token — from manifests alone, no data read. Built by
      // two plain appends, one idempotent append WITH its replay
      // (absent from history — at-most-once means the replay never
      // became a commit), and a rewrite (delete-all + re-add
      // footprint visible). The oracle re-derives every row count
      // from the raw table
      (s, d) => {
        val root = freshTxRoot(s, "hist", d)
        val doc = txDocs(s, d)
        TxLog.append(s, root, doc.where(col("doc_id") % 3 === 0),
          Some("doc_id"))
        TxLog.append(s, root, doc.where(col("doc_id") % 3 === 1),
          Some("doc_id"))
        TxLog.appendIdempotent(s, root, doc.where(col("doc_id") % 3 === 2),
          "intake", 7L, Some("doc_id"))
        TxLog.appendIdempotent(s, root, doc.where(col("doc_id") % 3 === 2),
          "intake", 7L, Some("doc_id")) // replay: no new history row
        TxLog.rewrite(s, root, Some("doc_id"))(
          _.where(length(col("text")) >= 200))
        TxLog.history(s, root).orderBy("version")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE doc_id < 2000)
              SELECT CAST(1 AS BIGINT) AS version, 'append' AS action,
                CAST(1 AS BIGINT) AS n_adds,
                (SELECT count(*) FROM d WHERE doc_id % 3 = 0) AS rows_added,
                CAST(0 AS BIGINT) AS n_removes,
                CAST(NULL AS VARCHAR) AS txn_app,
                CAST(NULL AS BIGINT) AS txn_batch
              UNION ALL
              SELECT 2, 'append', 1,
                (SELECT count(*) FROM d WHERE doc_id % 3 = 1), 0,
                NULL, NULL
              UNION ALL
              SELECT 3, 'append', 1,
                (SELECT count(*) FROM d WHERE doc_id % 3 = 2), 0,
                'intake', 7
              UNION ALL
              SELECT 4, 'rewrite', 1,
                (SELECT count(*) FROM d WHERE length(text) >= 200), 3,
                NULL, NULL
              ORDER BY version""")),

    QueryDef("x157_logit_train",
      // ITERATIVE gradient training in exact algebra (r12): 3 batch-GD
      // steps of hard-sigmoid logistic regression — weights in Long
      // micro-units, the piecewise-linear activation
      // p_ppm = (clamp(z, ±2e6) + 2e6) >> 2 (no transcendentals),
      // gradients as order-free integer sums, floor-division updates.
      // The oracle replays ALL THREE iterations unrolled — every
      // weight of every step is compared, so one wrong gradient term,
      // clamp bound, or division rounding anywhere in the cascade
      // diverges. Per step: one pinned-projection scan + a 1-row agg
      (s, d) => {
        val doc = documents(s, d).where(col("doc_id") < 2000)
        val y = when(col("lang") === "en", 1000000L).otherwise(0L)
        val x1 = least(TextAnalysis.tokenCount(col("text")), lit(200)) - 50
        val x2 = least(expr("length(text) DIV 10"), lit(60)) - 30
        Sampling.hardLogitTrain(doc, y, Seq(lit(1L), x1, x2),
            iters = 3, etaDen = 1000)
          .orderBy("iter", "i")
      },
      Some(s"""WITH $logitOracleCtes
              SELECT CAST(1 AS INT) AS iter, CAST(0 AS INT) AS i,
                CAST(a AS BIGINT) AS w_unats FROM wa
              UNION ALL SELECT 1, 1, b FROM wa
              UNION ALL SELECT 1, 2, c FROM wa
              UNION ALL SELECT 2, 0, a FROM wb
              UNION ALL SELECT 2, 1, b FROM wb
              UNION ALL SELECT 2, 2, c FROM wb
              UNION ALL SELECT 3, 0, a FROM wc
              UNION ALL SELECT 3, 1, b FROM wc
              UNION ALL SELECT 3, 2, c FROM wc
              ORDER BY iter, i""")),

    QueryDef("x159_logit_score",
      // the trained linear probe APPLIED as a corpus gate: every doc
      // scored under the 3-step weights with the same exact activation
      // (train and serve share one arithmetic — no train/serve skew
      // possible), `kept` at the 0.5 boundary. Map-only over the
      // corpus with a driver-held weight vector; the oracle replays
      // training AND scoring end to end
      (s, d) => {
        val sess = s
        import sess.implicits._
        val doc = documents(s, d).where(col("doc_id") < 2000)
        val y = when(col("lang") === "en", 1000000L).otherwise(0L)
        val x1 = least(TextAnalysis.tokenCount(col("text")), lit(200)) - 50
        val x2 = least(expr("length(text) DIV 10"), lit(60)) - 30
        val xs = Seq(lit(1L), x1, x2)
        val w = Sampling.hardLogitTrain(doc, y, xs, iters = 3,
            etaDen = 1000)
          .where(col("iter") === 3).orderBy("i")
          .select("w_unats").as[Long].collect().toSeq
        Sampling.hardLogitScore(doc, xs, w)
          .select(col("doc_id"), col("score_ppm"), col("kept"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $logitOracleCtes
              SELECT ft.doc_id,
                (greatest(-2000000, least(2000000,
                   wc.a * ft.x0 + wc.b * ft.x1 + wc.c * ft.x2))
                 + 2000000) // 4 AS score_ppm,
                (greatest(-2000000, least(2000000,
                   wc.a * ft.x0 + wc.b * ft.x1 + wc.c * ft.x2))
                 + 2000000) // 4 >= 500000 AS kept
              FROM ft, wc ORDER BY doc_id""")),

    QueryDef("x152_nb_model",
      // the LEARNED quality/langid filter, training half (r12):
      // multinomial Naive Bayes over the hashed bag-of-ngrams
      // features — the fastText-style seed-classifier pattern (GPT-3
      // quality filter, CCNet langid) in exact algebra. Trained on
      // the even-doc slice labeled by `lang`; the model is the full
      // (labels × buckets) grid of add-one-smoothed log-likelihoods
      // in Long micro-nats plus per-label log-priors (bucket = -1).
      // Model-sized output; the oracle re-derives every cell from the
      // raw text
      (s, d) => {
        val doc = documents(s, d)
        Sampling.nbModel(Sampling.nbState(
            doc.where(col("doc_id") % 2 === 0), "lang", "text"))
          .orderBy("label", "bucket")
      },
      Some(s"""WITH $nbOracleCtes
              SELECT lang AS label, bucket, lp AS lp_unats FROM model
              UNION ALL
              SELECT lang, -1, lp FROM pri
              ORDER BY label, bucket""")),

    QueryDef("x153_nb_classify",
      // the classify half: held-out odd docs scored under the frozen
      // even-doc model — per doc, exact integer `prior + Σ lp` per
      // label and a max-of-struct argmax (no window, no sort; ties
      // break toward the larger label both sides). One batch scan +
      // a broadcast model join + one per-doc hash agg — the shape
      // that filters 100 TB with a model trained on a seed set
      (s, d) => {
        val doc = documents(s, d)
        val m = Sampling.nbModel(Sampling.nbState(
          doc.where(col("doc_id") % 2 === 0), "lang", "text"))
        Sampling.nbClassify(doc.where(col("doc_id") % 2 === 1), m,
            "doc_id", "text")
          .select(col("doc_id"), col("lang").as("actual"),
            col("predicted"), col("score_unats"), col("n_feats"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $nbClassifyCtes
              SELECT doc_id, actual, predicted, score_unats, n_feats
              FROM pred ORDER BY doc_id"""),
      headline = true),

    QueryDef("x154_nb_confusion",
      // the measured-loss audit for the learned tier (the x62/x102
      // rule: every lossy operator ships its accuracy audit): the
      // held-out confusion matrix — actual × predicted counts — is
      // what decides whether the seed classifier is good enough to
      // gate a corpus. Group-count-sized output. On THIS synthetic
      // corpus it reads 0.436 vs a 0.43 majority base rate — i.e.
      // "the lang labels carry no token signal here, do not gate on
      // this model": the audit doing its job
      (s, d) => {
        val doc = documents(s, d)
        val m = Sampling.nbModel(Sampling.nbState(
          doc.where(col("doc_id") % 2 === 0), "lang", "text"))
        Sampling.nbClassify(doc.where(col("doc_id") % 2 === 1), m,
            "doc_id", "text")
          .groupBy(col("lang").as("actual"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy("actual", "predicted")
      },
      Some(s"""WITH $nbClassifyCtes
              SELECT actual, predicted, count(*) AS n
              FROM pred GROUP BY 1, 2
              ORDER BY actual, predicted""")),

    QueryDef("x160_tx_merge",
      // KEYED MERGE/upsert (r13 — the first thing a lakehouse user
      // does after append; the reference's K5 first-write-wins staging
      // is upsert-shaped): one change batch updates every %10==3 doc
      // (uppercased text), deletes every %10==7, and inserts fresh
      // keys (+10000) — applied as a manifest-stats-pruned rewrite of
      // only the dirs that can hold batch keys. The snapshot is
      // byte-accounted via md5 against the oracle's replay of the
      // merged state, so one lost update, surviving deleted row, or
      // dropped insert diverges
      (s, d) => {
        val root = freshTxRoot(s, "merge", d)
        val doc = txDocs(s, d)
        (0 until 4).foreach(k => TxLog.append(s, root,
          doc.where(col("doc_id") >= k * 500 && col("doc_id") < (k + 1) * 500),
          Some("doc_id")))
        val batch = doc.where(col("doc_id") % 10 === 3)
            .select(col("doc_id"), upper(col("text")).as("text"),
              lit(false).as("__del"))
          .unionByName(doc.where(col("doc_id") % 10 === 7)
            .select(col("doc_id"), col("text"), lit(true).as("__del")))
          .unionByName(doc.where(col("doc_id") % 10 === 1)
            .select((col("doc_id") + 10000L).as("doc_id"), col("text"),
              lit(false).as("__del")))
        TxLog.merge(s, root, batch, "doc_id", deleteCol = Some("__del"))
        TxLog.snapshot(s, root)
          .select(col("doc_id"), md5(col("text")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE doc_id < 2000)
              SELECT doc_id, md5(text) AS digest FROM (
                SELECT doc_id,
                  CASE WHEN doc_id % 10 = 3 THEN upper(text)
                    ELSE text END AS text
                FROM d WHERE doc_id % 10 <> 7
                UNION ALL
                SELECT doc_id + 10000, text FROM d WHERE doc_id % 10 = 1)
              ORDER BY doc_id""")),

    QueryDef("x161_tx_evolve",
      // SCHEMA EVOLUTION (r13 — the reference's gold schema is dynamic
      // by design: a new pollutant column is the NORMAL event, SURVEY
      // §1.3): generation A lands (doc_id, n_len INT); an explicit
      // evolveSchema widens n_len to BIGINT and adds lang; generation
      // B lands in the new shape. ONE snapshot reads both generations
      // — old dirs under their own physical schema, widened exactly,
      // added column null-backfilled — and the oracle replays the
      // aligned union from the raw table
      (s, d) => {
        val root = freshTxRoot(s, "evolve", d)
        val doc = documents(s, d).where(col("doc_id") < 2000)
        TxLog.append(s, root, doc.where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), length(col("text")).cast("int").as("n_len")),
          Some("doc_id"))
        TxLog.evolveSchema(s, root, "doc_id BIGINT, n_len BIGINT, lang STRING")
        TxLog.append(s, root, doc.where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), length(col("text")).cast("long").as("n_len"),
            col("lang")),
          Some("doc_id"))
        TxLog.snapshot(s, root)
          .select(col("doc_id"), col("n_len"),
            coalesce(col("lang"), lit("-")).as("lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_len,
                CASE WHEN doc_id % 2 = 1 THEN lang ELSE '-' END AS lang
              FROM documents WHERE doc_id < 2000 ORDER BY doc_id""")),

    QueryDef("x162_tx_multiprune",
      // MULTI-COLUMN manifest stats (r13): each append records min/max
      // for BOTH doc_id and n_len in one in-write metric set, and the
      // prune audit runs on the SECOND column — the x151 shape one
      // axis over (the z-order x122 layout clusters two dims; the
      // manifest should prune on each). Stats now travel with their
      // column name, so a read on n_len prunes only off n_len stats —
      // never off a doc_id range that happens to intersect
      (s, d) => {
        val root = freshTxRoot(s, "mprune", d)
        val doc = documents(s, d).where(col("doc_id") < 2000)
          .select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("n_len"))
        (0 until 10).foreach(k => TxLog.appendCols(s, root,
          doc.where(col("doc_id") >= k * 200 && col("doc_id") < (k + 1) * 200),
          Seq("doc_id", "n_len")))
        TxLog.pruneAudit(s, root, "n_len", 100, 300).orderBy("min_key")
      },
      Some("""WITH b AS (SELECT k.k AS k FROM range(0, 10) k(k)),
              g AS (SELECT doc_id // 200 AS k, count(*) AS c,
                      min(length(text)) AS mn, max(length(text)) AS mx
                    FROM documents WHERE doc_id < 2000 GROUP BY 1)
              SELECT coalesce(g.c, 0) AS n_rows,
                CAST(g.mn AS BIGINT) AS min_key,
                CAST(g.mx AS BIGINT) AS max_key,
                CASE WHEN g.mn IS NULL THEN true
                  ELSE g.mn < 300 AND g.mx >= 100 END AS scanned
              FROM b LEFT JOIN g ON b.k = g.k
              ORDER BY min_key""")),

    QueryDef("x163_cdc_merge_rebuild",
      // CDC→MERGE composition (r13 — the materialized-view maintenance
      // pattern; the r12 CDC→NB composition one layer up): a source
      // table takes two appends and a rewrite; a SECOND table is
      // maintained purely by replaying the source's per-version CDC
      // windows through keyed MERGE (per key, latest version wins;
      // within a version insert beats delete — a rewrite streams
      // delete-all + re-insert). Incremental apply must equal the
      // one-shot state, byte-accounted via md5
      (s, d) => {
        val rootA = freshTxRoot(s, "cmsrc", d)
        val rootB = freshTxRoot(s, "cmdst", d)
        val doc = txDocs(s, d)
        TxLog.append(s, rootA, doc.where(col("doc_id") % 2 === 0),
          Some("doc_id"))
        TxLog.append(s, rootA, doc.where(col("doc_id") % 2 === 1),
          Some("doc_id"))
        TxLog.rewrite(s, rootA, Some("doc_id"))(
          _.where(length(col("text")) >= 200))
        (1L to TxLog.latestVersion(s, rootA)).foreach { v =>
          val delta = TxLog.changes(s, rootA, v - 1, v)
          val batch = delta.groupBy("doc_id")
            .agg(max(struct(col("__version"),
              (col("__change") === "insert").cast("int").as("ins"),
              col("text"))).as("m"))
            .select(col("doc_id"), col("m.text").as("text"),
              (col("m.ins") === 0).as("__del"))
          TxLog.merge(s, rootB, batch, "doc_id", deleteCol = Some("__del"))
        }
        TxLog.snapshot(s, rootB)
          .select(col("doc_id"), md5(col("text")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS digest
              FROM documents WHERE doc_id < 2000 AND length(text) >= 200
              ORDER BY doc_id""")),

    QueryDef("x164_jpeg_dims",
      // JPEG dimensions via the SOF MARKER WALK (r13 — the majority
      // crawl format's metadata gap closed; no entropy decoding):
      // payloads carry genuine SOI + JFIF APP0 + an id-LENGTH-VARYING
      // COM segment + SOF0, so the codegen'd segment walk is exercised
      // at 29 different hop alignments, and the oracle replays
      // dims + total length from the id algebra alone —
      // parse(synthesize(dims)) == dims, the x100 pattern
      (s, d) => {
        val packed = Multimodal.packFakeJpegs(
          documents(s, d).where(col("doc_id") < 400), "doc_id")
        packed.select(col("media_id"),
            Multimodal.sniffFormat(col("media")).as("fmt"),
            Multimodal.imageDims(col("media")).getField("width").as("width"),
            Multimodal.imageDims(col("media")).getField("height").as("height"),
            length(col("media")).cast("long").as("n_bytes"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, 'jpeg' AS fmt,
                doc_id % 3000 + 16 AS width,
                (doc_id * 7) % 2000 + 16 AS height,
                CAST(45 + doc_id % 29 AS BIGINT) AS n_bytes
              FROM documents WHERE doc_id < 400 ORDER BY media_id"""))
  )

  /** The x95 oracle: TWO full training chains (prefix `a` = the old
    * doc_id<250 slice, prefix `b` = the full corpus) plus the
    * cross-application of the a-merges to the b-state (`u1..u8`),
    * ending in the 1-row inflation comparison. Same per-round algebra
    * as [[bpeOracle]]. */
  private lazy val x95Oracle: String = {
    def rounds(px: String): String = (1 to 8).map { i =>
      s"""${px}p$i AS (SELECT syms[CAST(i AS INT)] AS l,
                syms[CAST(i AS INT) + 1] AS r,
                CAST(sum(freq) AS BIGINT) AS c
              FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
                    FROM (SELECT string_split(substring(sym, 2, length(sym) - 2),
                            '||') AS syms, freq
                          FROM ${px}w${i - 1})
                    WHERE len(syms) >= 2)
              GROUP BY 1, 2),
              ${px}m$i AS (SELECT l, r, c FROM ${px}p$i ORDER BY c DESC, l, r LIMIT 1),
              ${px}w$i AS (SELECT word,
                CASE WHEN m.l IS NULL THEN sym
                  ELSE replace(sym, '|' || m.l || '||' || m.r || '|',
                                    '|' || m.l || m.r || '|') END AS sym,
                freq
              FROM ${px}w${i - 1} LEFT JOIN ${px}m$i m ON TRUE)"""
    }.mkString(",\n              ")
    val applies = (1 to 8).map { i =>
      s"""u$i AS (SELECT word,
                CASE WHEN m.l IS NULL THEN sym
                  ELSE replace(sym, '|' || m.l || '||' || m.r || '|',
                                    '|' || m.l || m.r || '|') END AS sym,
                freq
              FROM u${i - 1} LEFT JOIN am$i m ON TRUE)"""
    }.mkString(",\n              ")
    val nsyms = "len(string_split(substring(sym, 2, length(sym) - 2), '||'))"
    s"""WITH tk AS (
              SELECT doc_id, list_filter(string_split(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                x -> x <> '') AS toks
              FROM documents),
              un AS (SELECT doc_id, unnest(toks) AS word FROM tk),
              aw0 AS (SELECT word,
                regexp_replace(word, '(.)', '|\\1|', 'g') AS sym,
                count(*) AS freq
              FROM un WHERE doc_id < 250 GROUP BY 1, 2),
              bw0 AS (SELECT word,
                regexp_replace(word, '(.)', '|\\1|', 'g') AS sym,
                count(*) AS freq
              FROM un GROUP BY 1, 2),
              ${rounds("a")},
              ${rounds("b")},
              u0 AS (SELECT * FROM bw0),
              $applies,
              so AS (SELECT CAST(sum(freq) AS BIGINT) AS total_words,
                CAST(sum(freq * $nsyms) AS BIGINT) AS tokens_old FROM u8),
              sn AS (SELECT CAST(sum(freq * $nsyms) AS BIGINT) AS tokens_new
                FROM bw8)
              SELECT total_words, tokens_old, tokens_new,
                tokens_old * 1000000 // tokens_new AS inflation_ppm
              FROM so, sn"""
  }

  /** Chained-CTE DuckDB replay of [[graft.operators.Bpe]] training:
    * `w0` is the word-frequency state in delimited-symbol encoding,
    * then per round i: `p_i` adjacent-pair weighted counts → `m_i`
    * the top-1 merge (count DESC, l, r) → `w_i` the state with that
    * merge applied (LEFT JOIN ON TRUE keeps the chain total when a
    * round finds no pair — the engine stops early, the SQL rounds go
    * empty, both emit the same merge rows). `finalSelect` reads any
    * of `un` (doc_id, word), `m1..mk`, `w0..wk`. */
  private def bpeOracle(k: Int, finalSelect: String): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS (SELECT syms[CAST(i AS INT)] AS l,
                syms[CAST(i AS INT) + 1] AS r,
                CAST(sum(freq) AS BIGINT) AS c
              FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
                    FROM (SELECT string_split(substring(sym, 2, length(sym) - 2),
                            '||') AS syms, freq
                          FROM w${i - 1})
                    WHERE len(syms) >= 2)
              GROUP BY 1, 2),
              m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
              w$i AS (SELECT word,
                CASE WHEN m.l IS NULL THEN sym
                  ELSE replace(sym, '|' || m.l || '||' || m.r || '|',
                                    '|' || m.l || m.r || '|') END AS sym,
                freq
              FROM w${i - 1} LEFT JOIN m$i m ON TRUE)"""
    }.mkString(",\n              ")
    s"""WITH tk AS (
              SELECT doc_id, list_filter(string_split(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                x -> x <> '') AS toks
              FROM documents),
              un AS (SELECT doc_id, unnest(toks) AS word FROM tk),
              w0 AS (SELECT word,
                regexp_replace(word, '(.)', '|\\1|', 'g') AS sym,
                count(*) AS freq
              FROM un GROUP BY 1, 2),
              $rounds
              $finalSelect"""
  }

  /** The x106 oracle: BATCHED BPE training replayed in DuckDB. Each
    * round k: pair counts over the incrementally re-symbolized state
    * w(k-1) → the top-`window` candidates ranked (count DESC, l, r) →
    * the conservative order-free acceptance rule (candidate i in iff
    * it interacts with NO higher-ranked candidate j — shared symbol
    * or either's concat minting the other's side) as one correlated
    * NOT EXISTS, capped at `batch` → all accepted merges applied in
    * ONE list_reduce replace pass (replacement text derived from the
    * pattern itself: strip the interior '||'). `rounds` full rounds
    * are replayed, the accepted rows concatenate in (round, slot)
    * order, and the first `merges` win — identical to the engine's
    * mid-round total-cap truncation because acceptance is a pure
    * rank-order scan (prefix-stable; see Bpe.trainBatched). */
  private def bpeBatchedOracle(rounds: Int, batch: Int, window: Int,
      merges: Int): String = {
    val conflict = """j.l = i.l OR j.l = i.r OR j.r = i.l OR j.r = i.r
                OR j.l || j.r = i.l OR j.l || j.r = i.r
                OR i.l || i.r = j.l OR i.l || i.r = j.r"""
    val roundCtes = (1 to rounds).map { k =>
      s"""p$k AS (SELECT syms[CAST(i AS INT)] AS l,
                syms[CAST(i AS INT) + 1] AS r,
                CAST(sum(freq) AS BIGINT) AS c
              FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
                    FROM (SELECT string_split(substring(sym, 2, length(sym) - 2),
                            '||') AS syms, freq
                          FROM w${k - 1})
                    WHERE len(syms) >= 2)
              GROUP BY 1, 2),
              t$k AS MATERIALIZED (SELECT l, r, c,
                row_number() OVER (ORDER BY c DESC, l, r) AS rk
              FROM p$k ORDER BY c DESC, l, r LIMIT $window),
              a$k AS MATERIALIZED (SELECT l, r, c,
                row_number() OVER (ORDER BY i.rk) AS bi
              FROM t$k i
              WHERE NOT EXISTS (SELECT 1 FROM t$k j
                WHERE j.rk < i.rk AND ($conflict))
              QUALIFY bi <= $batch),
              w$k AS MATERIALIZED (SELECT word, list_reduce(
                list_prepend(sym, (SELECT coalesce(
                  list('|' || l || '||' || r || '|' ORDER BY bi), [])
                  FROM a$k)),
                (acc, x) -> replace(acc, x, replace(x, '||', ''))) AS sym,
                freq
              FROM w${k - 1})"""
    }.mkString(",\n              ")
    val unions = (1 to rounds).map(k =>
      s"SELECT $k AS rnd, bi, l, r, c FROM a$k")
      .mkString("\n                UNION ALL ")
    s"""WITH tk AS (
              SELECT doc_id, list_filter(string_split(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                x -> x <> '') AS toks
              FROM documents),
              un AS (SELECT doc_id, unnest(toks) AS word FROM tk),
              w0 AS (SELECT word,
                regexp_replace(word, '(.)', '|\\1|', 'g') AS sym,
                count(*) AS freq
              FROM un GROUP BY 1, 2),
              $roundCtes,
              allacc AS ($unions)
              SELECT * FROM (
                SELECT CAST(row_number() OVER (ORDER BY rnd, bi) AS INT)
                    AS rank,
                  l, r, l || r AS merged, c AS pair_count
                FROM allacc)
              WHERE rank <= $merges ORDER BY rank"""
  }

  private lazy val langIdOracle: String = {
    val hitExprs = TextAnalysis.stopwords.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(tk, x -> x IN ($set))) AS h_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.stopwords.map(_._1)
    val m = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val pick = langs.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
    s"""WITH tok AS (
          SELECT doc_id, list_filter(string_split(
            trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
            x -> x <> '') AS tk
          FROM documents),
        hits AS (SELECT doc_id, $hitExprs FROM tok),
        best AS (SELECT *, $m AS m FROM hits)
        SELECT doc_id,
          CASE WHEN m = 0 THEN 'und' $pick END AS lang_pred
        FROM best ORDER BY doc_id"""
  }

  /** The x52 oracle: the FULL curation funnel replayed in DuckDB —
    * clean (x21's regex chain) → tokens/quality/langid (the x49/x09
    * machinery, over the CLEANED text) → filter → two-batch
    * sequential first-wins across BOTH index tiers: exact tier =
    * min-id per fingerprint with batch-2 dropping batch-1 digests
    * (the x50 algebra), fuzzy tier = the x46 MinHash replay
    * (band candidates + exact Jaccard) with recursive-CTE components
    * within each batch and batch-2 additionally dropping near-dups of
    * batch-1's ACCEPTED docs. Stopword lists and langid pick order
    * interpolate from [[TextAnalysis.stopwords]] so the oracle can
    * never drift from the engine's. */
  private lazy val curateIntakeOracle: String = {
    val hitExprs = TextAnalysis.stopwords.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($set))) AS h_$lang"
    }.mkString(",\n                  ")
    val langs = TextAnalysis.stopwords.map(_._1)
    val m = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val pick = langs.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
    val stopsSum = langs.map(l => s"h_$l").mkString(" + ")
    s"""WITH RECURSIVE cl AS (
          SELECT doc_id, source,
            trim(regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(text, '<[^>]*>', ' ', 'g'),
                'https?://[^\\s]+', ' ', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+', ' ', 'g'),
            '\\s+', ' ', 'g')) AS cl
          FROM documents),
        tok AS (
          SELECT doc_id, source, cl,
            list_filter(string_split(
              trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g')), ' '),
              x -> x <> '') AS toks
          FROM cl),
        ft AS (
          SELECT doc_id, source, cl, toks,
            len(toks) AS n_tok,
            CAST(len(toks) AS DOUBLE) AS n_tok_d,
            CASE WHEN len(toks) > 0 THEN
              CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS avg_len,
            CASE WHEN length(cl) > 0 THEN
              CAST(length(cl) - len(regexp_extract_all(cl, '[a-zA-Z0-9\\s]')) AS DOUBLE)
                / length(cl)
            ELSE 1.0 END AS punct,
            $hitExprs
          FROM tok),
        sc AS (
          SELECT *, CAST($stopsSum AS DOUBLE) AS stops, $m AS m FROM ft),
        q AS (
          SELECT doc_id, source, cl, toks, n_tok,
            (least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
             + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
             + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
             + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) AS quality,
            CASE WHEN m = 0 THEN 'und' $pick END AS lang
          FROM sc),
        flt AS (
          SELECT * FROM q
          WHERE lang IN ('en', 'und') AND n_tok >= 10 AND quality >= 0.3),
        fpd AS (
          SELECT *, md5(trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g'))) AS fp
          FROM flt),
        e1 AS (SELECT min(doc_id) AS doc_id, fp FROM fpd
               WHERE doc_id < 300 GROUP BY fp),
        e2 AS (SELECT min(doc_id) AS doc_id, fp FROM fpd
               WHERE doc_id >= 300 AND fp NOT IN (SELECT fp FROM e1)
               GROUP BY fp),
        eu AS (SELECT doc_id FROM e1 UNION ALL SELECT doc_id FROM e2),
        th AS (
          SELECT f.doc_id,
            list_transform(f.toks,
              t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
            len(f.toks) AS nt
          FROM fpd f JOIN eu ON eu.doc_id = f.doc_id
          WHERE len(f.toks) > 0),
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
          SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
          FROM bands b JOIN bands c
            ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
        prs AS (
          SELECT p.id_a, p.id_b FROM cand p
          JOIN sh a ON a.doc_id = p.id_a
          JOIN sh b ON b.doc_id = p.id_b
          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
            >= 0.5),
        ed1 AS (
          SELECT id_a, id_b FROM prs WHERE id_a < 300 AND id_b < 300
          UNION ALL
          SELECT id_b, id_a FROM prs WHERE id_a < 300 AND id_b < 300),
        r1 AS (
          SELECT id_a AS id, id_a AS r FROM ed1
          UNION
          SELECT re.id, e.id_b AS r FROM r1 re JOIN ed1 e ON e.id_a = re.r),
        a1 AS (
          SELECT doc_id FROM e1
          WHERE doc_id NOT IN
            (SELECT id FROM r1 GROUP BY id HAVING min(r) < id)),
        ed2 AS (
          SELECT id_a, id_b FROM prs WHERE id_a >= 300 AND id_b >= 300
          UNION ALL
          SELECT id_b, id_a FROM prs WHERE id_a >= 300 AND id_b >= 300),
        r2 AS (
          SELECT id_a AS id, id_a AS r FROM ed2
          UNION
          SELECT re.id, e.id_b AS r FROM r2 re JOIN ed2 e ON e.id_a = re.r),
        w2 AS (
          SELECT doc_id FROM e2
          WHERE doc_id NOT IN
            (SELECT id FROM r2 GROUP BY id HAVING min(r) < id)),
        a2 AS (
          SELECT doc_id FROM w2
          WHERE doc_id NOT IN
              (SELECT p.id_b FROM prs p JOIN a1 ON a1.doc_id = p.id_a)
            AND doc_id NOT IN
              (SELECT p.id_a FROM prs p JOIN a1 ON a1.doc_id = p.id_b))
        SELECT f.doc_id, substring(f.cl, 1, 60) AS text_head,
          f.lang AS lang_id, floor(f.quality * 10000) / 10000 AS quality,
          f.n_tok AS n_tokens, f.source
        FROM fpd f
        WHERE f.doc_id IN (SELECT doc_id FROM a1
                           UNION ALL SELECT doc_id FROM a2)
        ORDER BY f.doc_id"""
  }

  /** The x58 oracle: the one-shot funnel replay (the x52 scoring +
    * fuzzy blocks, unpartitioned) inverted to emit the DROPPED side —
    * per-reason counts plus the md5-ordered k-sample. Repetition and
    * contamination are configured out (maxRepetition 1.0, no eval);
    * both are independently oracled (x24, x33). */
  private lazy val rejectionAuditOracle: String = {
    val hitExprs = TextAnalysis.stopwords.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($set))) AS h_$lang"
    }.mkString(",\n                  ")
    val langs = TextAnalysis.stopwords.map(_._1)
    val m = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val pick = langs.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
    val stopsSum = langs.map(l => s"h_$l").mkString(" + ")
    s"""WITH RECURSIVE cl AS (
          SELECT doc_id,
            trim(regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(text, '<[^>]*>', ' ', 'g'),
                'https?://[^\\s]+', ' ', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+', ' ', 'g'),
            '\\s+', ' ', 'g')) AS cl
          FROM documents),
        tok AS (
          SELECT doc_id, cl,
            list_filter(string_split(
              trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g')), ' '),
              x -> x <> '') AS toks
          FROM cl),
        ft AS (
          SELECT doc_id, cl, toks,
            len(toks) AS n_tok,
            CAST(len(toks) AS DOUBLE) AS n_tok_d,
            CASE WHEN len(toks) > 0 THEN
              CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS avg_len,
            CASE WHEN length(cl) > 0 THEN
              CAST(length(cl) - len(regexp_extract_all(cl, '[a-zA-Z0-9\\s]')) AS DOUBLE)
                / length(cl)
            ELSE 1.0 END AS punct,
            $hitExprs
          FROM tok),
        sc AS (
          SELECT *, CAST($stopsSum AS DOUBLE) AS stops, $m AS m FROM ft),
        q AS (
          SELECT doc_id, cl, toks, n_tok,
            (least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
             + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
             + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
             + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) AS quality,
            CASE WHEN m = 0 THEN 'und' $pick END AS lang
          FROM sc),
        flt AS (
          SELECT * FROM q
          WHERE lang = 'en' AND n_tok >= 10 AND quality >= 0.3),
        fpd AS (
          SELECT *, md5(trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g'))) AS fp
          FROM flt),
        e AS (SELECT min(doc_id) AS doc_id, fp FROM fpd GROUP BY fp),
        th AS (
          SELECT f.doc_id,
            list_transform(f.toks,
              t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
            len(f.toks) AS nt
          FROM fpd f JOIN e ON e.doc_id = f.doc_id
          WHERE len(f.toks) > 0),
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
          SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
          FROM bands b JOIN bands c
            ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
        prs AS (
          SELECT p.id_a, p.id_b FROM cand p
          JOIN sh a ON a.doc_id = p.id_a
          JOIN sh b ON b.doc_id = p.id_b
          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
            >= 0.5),
        ed AS (
          SELECT id_a, id_b FROM prs
          UNION ALL SELECT id_b, id_a FROM prs),
        r AS (
          SELECT id_a AS id, id_a AS r FROM ed
          UNION
          SELECT re.id, e2.id_b AS r FROM r re JOIN ed e2 ON e2.id_a = re.r),
        reasons AS (
          SELECT doc_id,
            CASE WHEN lang <> 'en' THEN 'lang'
                 WHEN n_tok < 10 THEN 'tokens'
                 ELSE 'quality' END AS reason
          FROM q
          WHERE NOT (lang = 'en' AND n_tok >= 10
                     AND quality >= 0.3)
          UNION ALL
          SELECT doc_id, 'exact_dup' FROM fpd
          WHERE doc_id NOT IN (SELECT doc_id FROM e)
          UNION ALL
          SELECT id AS doc_id, 'fuzzy_dup' FROM r
          GROUP BY id HAVING min(r) < id),
        counts AS (
          SELECT reason, count(*) AS n_dropped FROM reasons GROUP BY reason),
        sam AS (
          SELECT reason, doc_id, row_number() OVER (PARTITION BY reason
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM reasons)
        SELECT s.reason, c.n_dropped, s.doc_id
        FROM sam s JOIN counts c ON c.reason = s.reason
        WHERE s.rk <= 10 ORDER BY s.reason, s.doc_id"""
  }

  private lazy val qualityOracle: String =
    """WITH t AS (
         SELECT doc_id, text,
           list_filter(string_split(
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
             x -> x <> '') AS toks
         FROM documents),
       f AS (
         SELECT doc_id,
           CAST(len(toks) AS DOUBLE) AS n_tok,
           CASE WHEN len(toks) > 0 THEN
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS avg_len,
           CASE WHEN length(text) > 0 THEN
             CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9\s]')) AS DOUBLE)
               / length(text)
           ELSE 1.0 END AS punct,
           CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','ich','mit','von')))
              + len(list_filter(toks, x -> x IN ('the','and','is','of','to','in','that','it','was','for')))
              + len(list_filter(toks, x -> x IN ('el','la','los','las','es','y','en','que','por','una')))
              + len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))
              + len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','就','不','人'))) AS DOUBLE) AS stops
         FROM t)
       SELECT doc_id, floor((
           least(greatest(n_tok / 100.0, 0.0), 1.0) * 0.25
         + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
         + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
         + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) * 10000) / 10000 AS quality
       FROM f ORDER BY doc_id"""

  /** name -> builder, for SparkEntry.queries. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => e.name -> e.build).toMap

  /** name -> DuckDB SQL, for SparkEntry.oracleSql. */
  lazy val oracleSql: Map[String, String] =
    entries.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap

  /** headline queries for Bench. */
  lazy val headlines: Seq[QueryDef] = entries.filter(_.headline)
}
