package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared plumbing for the Catalog parts: the exact-sum/cosine/URL/
  * NB/logit oracle fragments and the tx-table fixtures every part's
  * QueryDefs lean on. private[graft] — the public surface stays
  * [[Catalog]]. */
private[graft] object CatalogShared {

  import Tables._


  /** decimal-exact sum of a double column expression, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** DuckDB cosine-similarity fragment between two float-list columns —
    * the exact double algebra `Similarity.cosine` computes (and that
    * x06 proves hash-compatible at 4dp). */
  def cosineSql(a: String, b: String): String =
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
  def messyUrl(id: Column): Column = concat(
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
  val urlCanonCtes: String = """d AS (
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

  def bucketSql(v: String, planes: Int): String =
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
  def freshTxRoot(s: SparkSession, tag: String, d: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_tx_${tag}_" +
      Integer.toHexString(d.hashCode)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  /** The x147–x151 base slice: (doc_id, text) under 2000 — 500 docs
    * at sf0.001/0.01, 2000 at sf0.1. */
  def txDocs(s: SparkSession, d: String) =
    documents(s, d).where(col("doc_id") < 2000)
      .select(col("doc_id"), col("text"))

  /** The x152–x154 oracle: the FULL Naive Bayes train chain in SQL —
    * tokenize/bigram/hash the even-doc training slice (the x97
    * feature algebra, salt `nb`), per-(lang, bucket) counts, the
    * full-domain smoothed model in Long micro-nats, and log-priors —
    * ending in `model(lang, bucket, lp)` + `pri(lang, lp)`. */
  val nbOracleCtes: String = """trd AS (
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
  val nbClassifyCtes: String = nbOracleCtes + """,
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
  val logitOracleCtes: String = """ft AS (
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

  lazy val x95Oracle: String = {
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
  def bpeOracle(k: Int, finalSelect: String): String = {
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
  def bpeBatchedOracle(rounds: Int, batch: Int, window: Int,
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

  lazy val langIdOracle: String = {
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
  lazy val curateIntakeOracle: String = {
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
        tok AS MATERIALIZED (
          SELECT doc_id, source, cl,
            list_filter(string_split(
              trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g')), ' '),
              x -> x <> '') AS toks
          FROM cl),
        ft AS MATERIALIZED (
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
        sc AS MATERIALIZED (
          SELECT *, CAST($stopsSum AS DOUBLE) AS stops, $m AS m FROM ft),
        q AS MATERIALIZED (
          SELECT doc_id, source, cl, toks, n_tok,
            (least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
             + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
             + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
             + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) AS quality,
            CASE WHEN m = 0 THEN 'und' $pick END AS lang
          FROM sc),
        flt AS MATERIALIZED (
          SELECT * FROM q
          WHERE lang IN ('en', 'und') AND n_tok >= 10 AND quality >= 0.3),
        fpd AS MATERIALIZED (
          SELECT *, md5(trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g'))) AS fp
          FROM flt),
        e1 AS MATERIALIZED (SELECT min(doc_id) AS doc_id, fp FROM fpd
               WHERE doc_id < 300 GROUP BY fp),
        e2 AS MATERIALIZED (SELECT min(doc_id) AS doc_id, fp FROM fpd
               WHERE doc_id >= 300 AND fp NOT IN (SELECT fp FROM e1)
               GROUP BY fp),
        eu AS MATERIALIZED (SELECT doc_id FROM e1 UNION ALL SELECT doc_id FROM e2),
        th AS MATERIALIZED (
          SELECT f.doc_id,
            list_transform(f.toks,
              t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
            len(f.toks) AS nt
          FROM fpd f JOIN eu ON eu.doc_id = f.doc_id
          WHERE len(f.toks) > 0),
        sh AS MATERIALIZED (
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
        mh AS MATERIALIZED (
          SELECT doc_id, i,
            min((((1103515245 * (i + 1) + 12345) % 2147483646 + 1)
                 * (s % 2147483647)
                 + ((69069 * (i + 1) + 1234567) % 2147483647))
                % 2147483647) AS m
          FROM (SELECT doc_id, unnest(hs) AS s FROM sh), range(0, 64) t(i)
          GROUP BY doc_id, i),
        bands AS MATERIALIZED (
          SELECT doc_id,
            CAST(i // 4 AS VARCHAR) || ',' ||
              string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bucket
          FROM mh GROUP BY doc_id, i // 4),
        cand AS MATERIALIZED (
          SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
          FROM bands b JOIN bands c
            ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
        prs AS MATERIALIZED (
          SELECT p.id_a, p.id_b FROM cand p
          JOIN sh a ON a.doc_id = p.id_a
          JOIN sh b ON b.doc_id = p.id_b
          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
            >= 0.5),
        ed1 AS MATERIALIZED (
          SELECT id_a, id_b FROM prs WHERE id_a < 300 AND id_b < 300
          UNION ALL
          SELECT id_b, id_a FROM prs WHERE id_a < 300 AND id_b < 300),
        r1 AS (
          SELECT id_a AS id, id_a AS r FROM ed1
          UNION
          SELECT re.id, e.id_b AS r FROM r1 re JOIN ed1 e ON e.id_a = re.r),
        a1 AS MATERIALIZED (
          SELECT doc_id FROM e1
          WHERE doc_id NOT IN
            (SELECT id FROM r1 GROUP BY id HAVING min(r) < id)),
        ed2 AS MATERIALIZED (
          SELECT id_a, id_b FROM prs WHERE id_a >= 300 AND id_b >= 300
          UNION ALL
          SELECT id_b, id_a FROM prs WHERE id_a >= 300 AND id_b >= 300),
        r2 AS (
          SELECT id_a AS id, id_a AS r FROM ed2
          UNION
          SELECT re.id, e.id_b AS r FROM r2 re JOIN ed2 e ON e.id_a = re.r),
        w2 AS MATERIALIZED (
          SELECT doc_id FROM e2
          WHERE doc_id NOT IN
            (SELECT id FROM r2 GROUP BY id HAVING min(r) < id)),
        a2 AS MATERIALIZED (
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
  lazy val rejectionAuditOracle: String = {
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
        tok AS MATERIALIZED (
          SELECT doc_id, cl,
            list_filter(string_split(
              trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g')), ' '),
              x -> x <> '') AS toks
          FROM cl),
        ft AS MATERIALIZED (
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
        sc AS MATERIALIZED (
          SELECT *, CAST($stopsSum AS DOUBLE) AS stops, $m AS m FROM ft),
        q AS MATERIALIZED (
          SELECT doc_id, cl, toks, n_tok,
            (least(greatest(n_tok_d / 100.0, 0.0), 1.0) * 0.25
             + least(greatest((avg_len - 2.0) / 6.0, 0.0), 1.0) * 0.25
             + (1.0 - least(greatest(punct, 0.0), 1.0)) * 0.25
             + least(greatest(stops / 10.0, 0.0), 1.0) * 0.25) AS quality,
            CASE WHEN m = 0 THEN 'und' $pick END AS lang
          FROM sc),
        flt AS MATERIALIZED (
          SELECT * FROM q
          WHERE lang = 'en' AND n_tok >= 10 AND quality >= 0.3),
        fpd AS MATERIALIZED (
          SELECT *, md5(trim(regexp_replace(lower(cl), '[^a-z0-9]+', ' ', 'g'))) AS fp
          FROM flt),
        e AS MATERIALIZED (SELECT min(doc_id) AS doc_id, fp FROM fpd GROUP BY fp),
        th AS MATERIALIZED (
          SELECT f.doc_id,
            list_transform(f.toks,
              t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h,
            len(f.toks) AS nt
          FROM fpd f JOIN e ON e.doc_id = f.doc_id
          WHERE len(f.toks) > 0),
        sh AS MATERIALIZED (
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
        mh AS MATERIALIZED (
          SELECT doc_id, i,
            min((((1103515245 * (i + 1) + 12345) % 2147483646 + 1)
                 * (s % 2147483647)
                 + ((69069 * (i + 1) + 1234567) % 2147483647))
                % 2147483647) AS m
          FROM (SELECT doc_id, unnest(hs) AS s FROM sh), range(0, 64) t(i)
          GROUP BY doc_id, i),
        bands AS MATERIALIZED (
          SELECT doc_id,
            CAST(i // 4 AS VARCHAR) || ',' ||
              string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bucket
          FROM mh GROUP BY doc_id, i // 4),
        cand AS MATERIALIZED (
          SELECT DISTINCT b.doc_id AS id_a, c.doc_id AS id_b
          FROM bands b JOIN bands c
            ON b.bucket = c.bucket AND b.doc_id < c.doc_id),
        prs AS MATERIALIZED (
          SELECT p.id_a, p.id_b FROM cand p
          JOIN sh a ON a.doc_id = p.id_a
          JOIN sh b ON b.doc_id = p.id_b
          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
            >= 0.5),
        ed AS MATERIALIZED (
          SELECT id_a, id_b FROM prs
          UNION ALL SELECT id_b, id_a FROM prs),
        r AS (
          SELECT id_a AS id, id_a AS r FROM ed
          UNION
          SELECT re.id, e2.id_b AS r FROM r re JOIN ed e2 ON e2.id_a = re.r),
        reasons AS MATERIALIZED (
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
        counts AS MATERIALIZED (
          SELECT reason, count(*) AS n_dropped FROM reasons GROUP BY reason),
        sam AS MATERIALIZED (
          SELECT reason, doc_id, row_number() OVER (PARTITION BY reason
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM reasons)
        SELECT s.reason, c.n_dropped, s.doc_id
        FROM sam s JOIN counts c ON c.reason = s.reason
        WHERE s.rk <= 10 ORDER BY s.reason, s.doc_id"""
  }

  lazy val qualityOracle: String =
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
}
