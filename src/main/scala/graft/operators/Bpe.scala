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
  * merge round then runs against that persisted vocab table, never
  * the corpus. The state is INCREMENTALLY RE-SYMBOLIZED: each round's
  * cache already carries all prior merges, so a round applies only
  * its newly accepted merges (one shallow codegen'd replace
  * projection — O(R) total replace work over R merges, the property
  * that makes a real 32k–50k vocabulary reachable), fans out adjacent
  * symbol pairs, and takes the winners from a bounded
  * `limit(window)` heap (TakeOrderedAndProject — never a global
  * sort); [[trainBatched]] accepts up to `batch` NON-INTERACTING
  * pairs per round, cutting the sequential-round count ~batch-fold.
  * The driver accumulates k merge rows — a model-sized artifact, the
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

  /** Rounds between lineage truncations in [[trainBatched]] (see its
    * scaladoc): plan depth — and the AQE explain string that DOUBLES
    * per cached level — stays bounded at this constant; each
    * truncation costs one vocab-sized materialization job. */
  val truncateEvery: Int = 4

  /** The RDD block set behind a localCheckpoint'ed frame, if that is
    * what `df` is. `Dataset.unpersist` releases only cacheManager
    * entries — checkpoint blocks are persisted directly on the RDD and
    * otherwise linger until the ContextCleaner notices the RDD is
    * unreachable (GC-timed, NOT scope-timed), which across many
    * training calls in one JVM accumulates dead vocab-sized block sets
    * in executor storage. Extracting the LogicalRDD lets the trainer
    * free a superseded checkpoint deterministically. */
  private def checkpointRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Learn up to `merges` BPE merges from a word-frequency state —
    * the SEQUENTIAL algorithm (one merge per round, the subword-nmt
    * definition). Delegates to [[trainBatched]] with batch = 1, whose
    * incremental re-symbolization makes total replace work O(R), not
    * the O(R²) of re-applying the whole chain every round. Identical
    * merge table to the naive form: round t's state is exactly the
    * base state under merges 1..t-1 either way. */
  def train(words: DataFrame, merges: Int): Seq[Merge] =
    trainBatched(words, merges, batch = 1, window = 1)

  /** Does candidate merge `b` INTERACT with an earlier-ranked
    * candidate `a` in the same round? If not, `b`'s pre-round pair
    * count is still exact after `a` is applied, and the two replaces
    * touch disjoint symbol spans — so both can merge in ONE pass.
    * Interaction = shared symbol (applying `a` consumes/produces the
    * adjacencies `b` counts) or either's merged symbol equaling one of
    * the other's sides (applying `a` MINTS new `b`-side symbols, or
    * `b` would mint an `a` side). Delimited per-symbol encoding means
    * nothing else can alias (a pattern can never match inside another
    * symbol's span). */
  private[graft] def interacts(a: Merge, b: Merge): Boolean =
    a.l == b.l || a.l == b.r || a.r == b.l || a.r == b.r ||
      a.l + a.r == b.l || a.l + a.r == b.r ||
      b.l + b.r == a.l || b.l + b.r == a.r

  /** BATCHED BPE training — the scale path to a real (32k–50k)
    * vocabulary. Two changes versus naive sequential training, both
    * published practice, neither changing the per-round algebra:
    *
    * 1. INCREMENTAL RE-SYMBOLIZATION. The persisted state holds the
    *    already-merged symbol string, so each round applies only the
    *    merges IT accepted (one shallow projection over the previous
    *    round's cache — the cache substitutes into the plan before
    *    optimization, so CollapseProject can never re-inline the whole
    *    history into one O(R)-deep replace chain). Total replace work
    *    is O(R); the naive re-apply-everything form is O(R²) — the
    *    difference between 50k merges being a day and being
    *    impossible.
    * 2. MERGE BATCHING. One pair-count job can safely yield MANY
    *    merges: the top-`window` candidates (count DESC, l, r) are
    *    scanned in rank order and candidate i is accepted iff it does
    *    not [[interacts]] with ANY higher-ranked candidate j < i —
    *    accepted or not (the conservative rule is order-free and
    *    replayable as one self-join in external SQL, no recursion) —
    *    up to `batch` per round. Non-interacting pairs have exact,
    *    mutually valid counts, so the batch applies in one projection.
    *    Sequential-job count drops ~batch-fold: a 32k vocabulary needs
    *    thousands of rounds, not tens of thousands. batch = 1 IS the
    *    sequential algorithm (window 1: the single top pair).
    *
    * Batched ranks are assigned in acceptance order, so the merge
    * table stays totally ordered and [[applyMerges]]/[[segmentCounts]]
    * consume it unchanged. With batch > 1 the merge ORDER (and on
    * adversarial ties the set) can differ from sequential training —
    * that is the documented trade every batched-BPE trainer makes;
    * determinism is unconditional (exact Long counts, lexicographic
    * tie-breaks, fixed window).
    *
    * Per round: one pair hash agg (map-side combine) over the
    * persisted vocab-sized state + a `window`-row bounded-heap collect;
    * the state projection is lazy and materialized by the NEXT round's
    * agg, at which point the grand-parent cache is dropped (≤ 2 states
    * ever live). Driver holds `merges` + `window` rows. Stops early
    * when no adjacent pair remains.
    *
    * LINEAGE TRUNCATION (measured, not theoretical): chained
    * round-over-cache plans are linear in the TREE but the AQE
    * executed-plan STRING doubles per cached level (each
    * TableCacheQueryStage's rendering embeds the full plan of the
    * cache it reads, which embeds the previous stage's, …) — by round
    * ~17 over a real corpus lineage the per-job explain string passes
    * 1 GB and the driver OOMs building it. Every [[truncateEvery]]
    * rounds the state is eagerly `localCheckpoint`ed: the logical
    * plan resets to the materialized rows, capping plan depth (and
    * that string) at a constant, so per-round cost stays flat to
    * thousands of rounds. On a cluster where executor loss matters,
    * set a reliable `spark.checkpoint.dir` and swap in `checkpoint`;
    * local-mode training (and any run that can simply re-run) keeps
    * the cheap local form. Old checkpoint blocks are freed by
    * Spark's ContextCleaner once unreferenced. */
  def trainBatched(words: DataFrame, merges: Int, batch: Int = 16,
      window: Int = 64): Seq[Merge] = {
    require(merges >= 1, s"Bpe.trainBatched: merges must be >= 1, got $merges")
    require(batch >= 1, s"Bpe.trainBatched: batch must be >= 1, got $batch")
    require(window >= batch,
      s"Bpe.trainBatched: window ($window) must be >= batch ($batch)")
    // respect a caller-managed persist (RunTokenizer shares one cache
    // between training and the fit audit): only own the lifecycle of
    // caches this call itself created
    val callerPersisted =
      words.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wide = if (callerPersisted) words else words.persist()
    // AQE off for the training rounds (restored on exit): each round
    // is a vocab-sized 1-to-few-task job where AQE's per-stage
    // re-planning is pure driver overhead — thousands of sequential
    // rounds pay it thousands of times. Plans this small gain nothing
    // from runtime re-optimization (the coalesce layout is already
    // explicit); results are plan-identical either way.
    val session = words.sparkSession
    val aqeBefore = session.conf.get("spark.sql.adaptive.enabled", "true")
    val vocabRows = wide.count() // also materializes the cache
    val maxTasks = words.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toLong
    val target = math.max(1L,
      math.min(vocabRows / trainWordsPerTask + 1L, maxTasks)).toInt
    // the symbolized state: (sym, freq), coalesced to the
    // trainWordsPerTask layout (X88AB: task dispatch, not data,
    // dominates small rounds). Round 1's agg materializes it straight
    // from the wide cache.
    var state = wide.coalesce(target)
      .select(symEncode(col("word")).as("sym"), col("freq")).persist()
    var parent: DataFrame = null // state's lineage parent, still cached
    // the live truncation checkpoint's blocks (see checkpointRdd): a
    // superseded checkpoint is freed the moment its successor is
    // eagerly materialized — nothing can read it after that (every
    // inter-checkpoint state is itself cached, and persist() spills
    // rather than evicts, so no recompute ever walks back to it)
    var cpBlocks: Option[org.apache.spark.rdd.RDD[_]] = None
    var sinceTruncate = 0
    val found = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      session.conf.set("spark.sql.adaptive.enabled", "false")
      var exhausted = false
      while (found.size < merges && !exhausted) {
        val __t0 = System.nanoTime()
        val top = state
          .select(symsOf(col("sym")).as("__s"), col("freq"))
          .where(size(col("__s")) >= 2)
          .select(explode(arrays_zip(
            slice(col("__s"), lit(1), size(col("__s")) - 1).as("l"),
            slice(col("__s"), lit(2), size(col("__s")) - 1).as("r"))).as("__p"),
            col("freq"))
          .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(window).collect()
        if (sys.env.contains("SPARK_GRAFT_BPE_DEBUG"))
          Console.err.println(f"[bpe] round found=${found.size}%5d " +
            f"${(System.nanoTime() - __t0) / 1e9}%7.3f s " +
            f"candidates=${top.length}")
        // the agg above materialized `state`; its parent cache (two
        // rounds back) can no longer be read by anything — release it
        if (parent != null) parent.unpersist(blocking = false)
        if (top.isEmpty) exhausted = true
        else {
          val cap = math.min(batch, merges - found.size)
          val candidates = top.map(r =>
            Merge(0, r.getString(0), r.getString(1), r.getLong(2)))
          val accepted = scala.collection.mutable.ArrayBuffer.empty[Merge]
          var i = 0
          while (i < candidates.length && accepted.size < cap) {
            // conservative order-free rule: reject on interaction with
            // ANY higher-ranked candidate, accepted or not
            if (!candidates.iterator.take(i).exists(interacts(_, candidates(i))))
              accepted += candidates(i).copy(rank = found.size + accepted.size + 1)
            i += 1
          }
          found ++= accepted
          parent = state
          val next = state
            .select(applyMerges(col("sym"), accepted.toSeq).as("sym"),
              col("freq"))
          sinceTruncate += 1
          state =
            if (sinceTruncate >= truncateEvery) {
              sinceTruncate = 0
              // eager: materializes NOW (reading the parent cache) and
              // resets the logical plan to the stored rows; the
              // PREVIOUS checkpoint's blocks are dead from this moment
              val cp = next.localCheckpoint(true)
              cpBlocks.foreach(_.unpersist(blocking = false))
              cpBlocks = checkpointRdd(cp)
              cp
            } else next.persist()
        }
      }
      found.toSeq
    } finally {
      session.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      state.unpersist(blocking = false)
      if (parent != null) parent.unpersist(blocking = false)
      // the merges live on the driver; no block set outlives the call
      cpBlocks.foreach(_.unpersist(blocking = false))
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
    val vocab = segmentVocab(occurrences.select("word").distinct(), merges)
    occurrences.join(vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("__ns")).as("n_bpe_tokens"))
  }

  /** Merges per projection when applying a LARGE merge table. A
    * single projection folding a real vocabulary's 32k-deep replace
    * chain is a megabyte of generated code janino cannot compile (and
    * interpreted fallback would be the hot path); chunks of this size
    * stay comfortably inside whole-stage codegen. */
  val segmentChunk: Int = 64

  /** (word, __ns) for a distinct-word frame under `merges` — the
    * dictionary half of [[segmentCounts]]. Small tables apply as ONE
    * codegen'd replace-chain projection; tables past [[segmentChunk]]
    * apply chunk-by-chunk with an eager localCheckpoint between
    * chunks (the trainBatched lineage-truncation lesson: it stops
    * CollapseProject re-inlining the whole chain into one giant
    * expression AND bounds each round of generated code). The
    * chunked walk runs on the VOCABULARY frame only — one
    * dictionary-sized job per chunk, never a corpus pass — so a 50k-
    * merge tokenizer costs ~800 small jobs at segmentation time,
    * independent of corpus size (the per-occurrence work stays one
    * hash join, unchanged). */
  private[graft] def segmentVocab(vocabWords: DataFrame,
      merges: Seq[Merge]): DataFrame =
    if (merges.size <= segmentChunk)
      vocabWords.select(col("word"),
        size(symsOf(applyMerges(symEncode(col("word")), merges))).as("__ns"))
    else {
      // each eager chunk checkpoint supersedes the previous one — free
      // the dead block set immediately (the trainBatched rule; only
      // the FINAL checkpoint survives, it backs the returned frame)
      var prevCp: Option[org.apache.spark.rdd.RDD[_]] = None
      val symed = merges.grouped(segmentChunk).foldLeft(
          vocabWords.select(col("word"), symEncode(col("word")).as("__sym"))) {
        (acc, group) =>
          val cp = acc
            .select(col("word"), applyMerges(col("__sym"), group).as("__sym"))
            .localCheckpoint(true)
          prevCp.foreach(_.unpersist(blocking = false))
          prevCp = checkpointRdd(cp)
          cp
      }
      symed.select(col("word"), size(symsOf(col("__sym"))).as("__ns"))
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
