package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog part 2: corpus curation extensions — exact/fuzzy dedup,
  * similarity/ANN, DSIR selection, contamination, intake growth.
  *
  * Split from the single-file Catalog at r13 (8.9k lines and growing
  * ~700/round); [[Catalog.entries]] concatenates the parts in the
  * original order, so the driver contract (queries/oracleSql/
  * headlines) is untouched. */
private[graft] object CatalogCorpusA {

  import Tables._
  import CatalogShared._

  val defs: Seq[QueryDef] = Seq(


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
              FROM k ORDER BY doc_id"""))
  )
}
