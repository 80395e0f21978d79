package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog part 3: corpus curation extensions — text analysis, packing,
  * sketches, spans, BPE tokenizer training.
  *
  * Split from the single-file Catalog at r13 (8.9k lines and growing
  * ~700/round); [[Catalog.entries]] concatenates the parts in the
  * original order, so the driver contract (queries/oracleSql/
  * headlines) is untouched. */
private[graft] object CatalogCorpusB {

  import Tables._
  import CatalogShared._

  val defs: Seq[QueryDef] = Seq(


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
              FROM j"""))
  )
}
