package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING at corpus scale — the step a
  * training-data pipeline runs between curation and packing: learn the
  * merge table that defines the subword vocabulary, then segment the
  * corpus under it (real token counts, not the regex proxy of
  * [[TextAnalysis.bpeTokenCount]]).
  *
  * Shape (the production-trainer shape, e.g. the original Sennrich
  * subword-nmt algorithm): the corpus is scanned ONCE into a
  * word-frequency state ([[wordState]] — vocabulary-sized, Zipf-bounded,
  * and MERGEABLE across batches like the DSIR/profile states); every
  * merge iteration then runs against that persisted vocab table, never
  * the corpus. Iteration i applies the i-1 merges found so far as a
  * NESTED-REPLACE projection (codegen'd string algebra — no iterative
  * lineage, no per-iteration checkpoint barrier), fans out adjacent
  * symbol pairs, and takes the top-1 weighted pair as a bounded
  * `limit(1)` heap (TakeOrderedAndProject — never a global sort). The
  * driver accumulates k merge rows — a model-sized artifact, the
  * documented pattern (shard lists, quantile thresholds).
  *
  * Determinism: pair counts are exact Long sums of exact Long word
  * frequencies; ties break (count DESC, left ASC, right ASC). No
  * doubles anywhere, so the merge table replays bit-for-bit in any
  * engine (the x88 DuckDB oracle re-derives all k merges).
  *
  * Symbol encoding: a word is held as its symbols each wrapped in
  * private delimiters — "hello" → `|h||e||l||l||o|` — so the merge
  * (l, r) is the plain-string replace `|l||r|` → `|lr|`. Each symbol
  * owns BOTH its delimiters (they are never shared between adjacent
  * symbols), which makes non-overlapping left-to-right `replace` —
  * the same primitive in Spark and every SQL engine — apply the merge
  * greedily leftmost, exactly the BPE rule ("aaa" under merge (a,a)
  * becomes [aa, a], not [a, aa]). Tokens are [a-z0-9]+ (normalized),
  * so '|' can never collide with content. */
object Bpe {

  /** One learned merge: `rank`-th pair (1-based), joined left+right,
    * with the weighted adjacent-pair count that won the round. */
  final case class Merge(rank: Int, l: String, r: String, count: Long)

  /** Word-frequency state: ONE corpus scan → (word, freq) — the only
    * corpus-sized job in BPE training. Mergeable: states from
    * disjoint batches combine by summed frequency ([[mergeWordStates]]),
    * so the tokenizer-training state GROWS with intake batches and
    * training from the grown state equals training one-shot on the
    * concatenated corpus (x90's contract — exact, because counts are
    * exact Longs and training reads only counts). */
  def wordState(df: DataFrame, textCol: String): DataFrame =
    Rebalance(df.select(col(textCol).as("__text")))
      .select(explode(TextAnalysis.tokens(col("__text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Merge word-frequency states (union → summed counts). Order of
    * states is irrelevant — Long addition is associative/commutative. */
  def mergeWordStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeWordStates: need at least one state")
    states.reduce(_.unionByName(_)).groupBy("word").agg(sum("freq").as("freq"))
  }

  /** `word` → its delimited symbol string: "ab1" → `|a||b||1|`. */
  def symEncode(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** Delimited symbol string → symbol array: `|a||bc|` → [a, bc]. */
  def symsOf(sym: Column): Column =
    split(sym.substr(lit(2), length(sym) - 2), "\\|\\|")

  /** Apply learned merges IN RANK ORDER to a delimited symbol string —
    * a chain of plain-string replaces (codegen'd; leftmost
    * non-overlapping == the greedy BPE application rule under the
    * per-symbol-delimiter encoding, see object doc). */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym)((c, m) =>
      replace(c, lit("|" + m.l + "||" + m.r + "|"), lit("|" + m.l + m.r + "|")))

  /** Target vocab rows per task for the training rounds. The rounds
    * are SEQUENTIAL small jobs, so per-round scheduling cost scales
    * with task count, not data: at bench scale a 60k-word state over
    * 32 shuffle partitions spent more on task dispatch than on pair
    * counting (X88AB: 32-partition floor 1.31 s vs single-partition
    * 0.73 s, identical merges). Training coalesces the persisted
    * state to ~this many words per task (clamped to
    * [1, spark.sql.shuffle.partitions]), which keeps bench-scale
    * states on a few tasks and a web-scale vocabulary (~100M words)
    * on full parallelism. */
  val trainWordsPerTask: Long = 500000L

  /** Learn up to `merges` BPE merges from a word-frequency state.
    * Each round: apply merges-so-far (nested replace projection over
    * the persisted vocab table), fan out adjacent symbol pairs
    * weighted by word frequency, hash-agg, top-1 by
    * (count DESC, l ASC, r ASC) as a bounded heap. Stops early when no
    * adjacent pair remains (every word fully merged). k driver-held
    * rows total; the vocab table is persisted across the rounds —
    * coalesced to the [[trainWordsPerTask]] layout — and released on
    * exit. */
  def train(words: DataFrame, merges: Int): Seq[Merge] = {
    require(merges >= 1, s"Bpe.train: merges must be >= 1, got $merges")
    // respect a caller-managed persist (RunTokenizer shares one cache
    // between training and the fit audit): only own the lifecycle of
    // caches this call itself created
    val callerPersisted =
      words.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wide = if (callerPersisted) words else words.persist()
    val vocabRows = wide.count() // also materializes the cache
    val maxTasks = words.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toLong
    val target = math.max(1L,
      math.min(vocabRows / trainWordsPerTask + 1L, maxTasks)).toInt
    // round 1 materializes the narrow copy straight from the wide
    // cache; the wide copy is freed only after training so the narrow
    // one never falls back to recomputing the corpus lineage
    val base = wide.coalesce(target).persist()
    try {
      val found = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var exhausted = false
      while (found.size < merges && !exhausted) {
        val syms = symsOf(applyMerges(symEncode(col("word")), found.toSeq))
        val top = base
          .select(syms.as("__s"), col("freq"))
          .where(size(col("__s")) >= 2)
          .select(explode(arrays_zip(
            slice(col("__s"), lit(1), size(col("__s")) - 1).as("l"),
            slice(col("__s"), lit(2), size(col("__s")) - 1).as("r"))).as("__p"),
            col("freq"))
          .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else found += Merge(found.size + 1,
          top.head.getString(0), top.head.getString(1), top.head.getLong(2))
      }
      found.toSeq
    } finally {
      base.unpersist(blocking = false)
      if (!callerPersisted) wide.unpersist(blocking = false)
    }
  }

  /** The learned merge table as a DataFrame artifact:
    * (rank, l, r, merged, pair_count) ordered by rank — the shippable
    * tokenizer definition (apply with [[applyMerges]] in rank order). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.l, m.r, m.l + m.r, m.count))
      .toDF("rank", "l", "r", "merged", "pair_count")
      .orderBy("rank")
  }

  /** Read a [[mergeTable]] artifact back into applicable form (rank
    * order restored; k driver-held rows — the model-sized-artifact
    * pattern). The consume side of [[graft.pipeline.RunTokenizer]]:
    * a training job loads the shipped merges and segments with
    * [[applyMerges]]/[[segmentCounts]] — it never retrains. */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("l"),
        r.getAs[String]("r"), r.getAs[Long]("pair_count"))).toSeq

  /** Segment documents under a learned merge table: per-document word
    * count and TRUE BPE token count (symbols after applying all merges).
    *
    * Shape: tokenize → explode (doc_id, word) → segment the DISTINCT
    * vocabulary only (the nested-replace chain runs once per distinct
    * word, not once per occurrence — the dictionary trick every real
    * tokenizer uses) → UNHINTED join back on word (AQE broadcasts a
    * small vocabulary, degrades to a shuffled hash join on a web-scale
    * one — the tfIdf lesson) → per-doc hash agg. Zero-token documents
    * emit no row (nothing to segment), matching the oracle's inner
    * join. Output: (doc_id, n_words, n_bpe_tokens). */
  def segmentCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val occurrences = Rebalance(df.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("__text"))).as("word"))
    val vocab = occurrences.select("word").distinct()
      .select(col("word"),
        size(symsOf(applyMerges(symEncode(col("word")), merges))).as("__ns"))
    occurrences.join(vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("__ns")).as("n_bpe_tokens"))
  }

  /** INTAKE NOVELTY: how much genuinely NEW vocabulary an arriving
    * batch brings relative to the grown word state — the cheap
    * early-warning that pairs with [[retrainAudit]] (novelty spikes
    * precede tokenizer decay; a domain-shifted source announces
    * itself here before it costs context budget). One batch-sized
    * wordState pass + one unhinted left join against the state (AQE
    * broadcasts a small batch vocabulary, degrades to a shuffled hash
    * join at scale) + a 1-row aggregate; the corpus never re-scans.
    *
    * Output 1 row: (batch_vocab, new_vocab, batch_words, new_words,
    * vocab_novelty_ppm, word_novelty_ppm) — vocab novelty is the
    * distinct-word view (lexicon shift), word novelty the occurrence
    * view (how much batch TEXT is new-word mass). Exact Longs /
    * floored ppm; null ppms on an empty batch. */
  def noveltyAudit(state: DataFrame, batch: DataFrame,
      textCol: String): DataFrame =
    noveltyAuditFromState(state, wordState(batch, textCol))

  /** [[noveltyAudit]] over an already-built batch word state — the
    * [[graft.pipeline.RunIntake]] seam: the intake computes the batch
    * state once to grow `bpe_state/` and reuses it here, so novelty
    * reporting adds one join and zero extra text scans. */
  def noveltyAuditFromState(state: DataFrame, batchState: DataFrame)
      : DataFrame = {
    batchState.join(state.select(col("word"), lit(1).as("__seen")),
        Seq("word"), "left_outer")
      .agg(
        count(lit(1)).as("batch_vocab"),
        count(when(col("__seen").isNull, 1)).as("new_vocab"),
        sum(col("freq")).as("batch_words"),
        coalesce(sum(when(col("__seen").isNull, col("freq"))), lit(0L))
          .as("new_words"))
      .select(col("batch_vocab"), col("new_vocab"), col("batch_words"),
        col("new_words"),
        expr("(new_vocab * CAST(1000000 AS BIGINT)) DIV batch_vocab")
          .as("vocab_novelty_ppm"),
        expr("(new_words * CAST(1000000 AS BIGINT)) DIV batch_words")
          .as("word_novelty_ppm"))
  }

  /** TOKENIZER RETRAIN DECISION: a corpus grows (intake batches fold
    * into the word state) while the shipped tokenizer stays frozen —
    * when is retraining worth a new vocabulary rollout? Measure the
    * decay directly: segment the CURRENT state under the OLD merges
    * and under freshly trained ones, and compare token totals.
    * `inflation_ppm` = tokens_old · 1e6 DIV tokens_new: 1,000,000
    * means the frozen tokenizer still segments the grown corpus as
    * compactly as a fresh one; 1,050,000 means 5% more tokens — a 5%
    * context-budget tax, the number a retrain threshold reads.
    *
    * Cost: both trainings and both measurements are vocab-sized jobs
    * over the two states ([[train]]/[[segmentStats]]); with states
    * from RunIntake's `bpe_state/` snapshots nothing ever re-scans
    * the corpus. Exact Longs end to end.
    * Output 1 row: (total_words, tokens_old, tokens_new,
    * inflation_ppm). */
  def retrainAudit(oldState: DataFrame, newState: DataFrame,
      merges: Int): DataFrame = {
    val mOld = train(oldState, merges)
    val mNew = train(newState, merges)
    val old = segmentStats(newState, mOld)
      .select(col("total_words"), col("total_bpe_tokens").as("tokens_old"))
    val fresh = segmentStats(newState, mNew)
      .select(col("total_bpe_tokens").as("tokens_new"))
    old.crossJoin(fresh).select(
      col("total_words"), col("tokens_old"), col("tokens_new"),
      expr("(tokens_old * CAST(1000000 AS BIGINT)) DIV tokens_new")
        .as("inflation_ppm"))
  }

  /** Corpus-level tokenizer-fit audit computed FROM THE STATE — a
    * vocab-sized job, the corpus is never re-scanned: every corpus
    * total is an exact Long recoverable from (word, freq) alone
    * (chars = Σ freq·|word|, BPE tokens = Σ freq·|segments(word)|).
    * One row: (vocab_words, total_words, total_chars,
    * total_bpe_tokens, chars_per_token_ppm, tokens_per_word_ppm) —
    * the compression-rate numbers a tokenizer budget decision reads
    * (floored integer ppm, externally replayable; null ppm on an
    * empty state). */
  def segmentStats(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val ns = size(symsOf(applyMerges(symEncode(col("word")), merges)))
    words.agg(
        count(lit(1)).as("vocab_words"),
        sum(col("freq")).as("total_words"),
        sum(col("freq") * length(col("word"))).as("total_chars"),
        sum(col("freq") * ns).as("total_bpe_tokens"))
      .select(col("vocab_words"), col("total_words"), col("total_chars"),
        col("total_bpe_tokens"),
        expr("(total_chars * CAST(1000000 AS BIGINT)) DIV total_bpe_tokens")
          .as("chars_per_token_ppm"),
        expr("(total_bpe_tokens * CAST(1000000 AS BIGINT)) DIV total_words")
          .as("tokens_per_word_ppm"))
  }
}
