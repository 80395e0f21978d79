package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data
  * run actually executes, built from the individually-verified
  * operators (each stage has its own hash-checked catalog query). One
  * call takes a raw document table to a cleaned, filtered, deduped,
  * decontaminated corpus with per-stage decision counters.
  *
  * Stage order is the standard funnel — cheap map-only filters first
  * so the expensive pairwise stages see the smallest corpus:
  *  1. clean      — strip tags/URLs/emails, collapse whitespace (map);
  *                  with `scrubPii` the surviving prose is also run
  *                  through [[TextAnalysis.redactPii]] (typed
  *                  placeholder tokens for anything the cleaner's
  *                  deletion patterns don't cover, e.g. bare IPs and
  *                  phone numbers)
  *  2. filter     — language allowlist + quality/length/repetition
  *                  thresholds (map)
  *  3. exact dedup — md5-fingerprint first-id-wins (one hash agg)
  *  4. fuzzy dedup — MinHash+LSH pairs → connected components →
  *                  min-id survivors
  *  5. decontaminate — drop documents sharing any n-gram shingle with
  *                  a held-out eval corpus (hash equi-join)
  *
  * Every decision is deterministic (portable hashes, min-id
  * survivors), so reruns — on any partitioning — keep byte-identical
  * corpora; [[report]] turns the audit column into per-stage counts.
  */
object Curate {

  /** Tunables with conservative defaults; thresholds are on the
    * verified operator outputs ([[TextAnalysis.qualityScore]] in
    * [0,1], [[TextAnalysis.repetitionRatio]] of duplicate 2-grams). */
  final case class Config(
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      minTokens: Int = 10,
      maxRepetition: Double = 0.3,
      shingleN: Int = 3,
      minhashK: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.8,
      contaminationN: Int = 5,
      scrubPii: Boolean = false)

  /** The curation funnel. Returns the surviving documents with the
    * cleaned text plus the language id and quality score that admitted
    * them. `eval` is the held-out corpus for decontamination as
    * (frame, idCol, textCol); None skips stage 5. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      eval: Option[(DataFrame, String, String)] = None): DataFrame = {
    // 1. clean (map-only; PII scrub folds into the same projection)
    val clean0 = TextAnalysis.cleanText(col(textCol))
    val cleaned = docs.withColumn("__clean",
      if (cfg.scrubPii) TextAnalysis.redactPii(clean0) else clean0)
    // 2. map-only filters, evaluated from ONE tokens materialization
    val toks = TextAnalysis.tokens(col("__clean"))
    val scored = cleaned
      .withColumn("__toks", toks)
      .withColumn("__lang", TextAnalysis.langIdFromTokens(col("__toks")))
      .withColumn("__quality",
        TextAnalysis.qualityScoreFromTokens(col("__clean"), col("__toks")))
      .withColumn("__rep", TextAnalysis.repetitionRatio(col("__toks"), 2))
    val passesFilters: Column =
      col("__lang").isin(cfg.langs: _*) &&
        size(col("__toks")) >= cfg.minTokens &&
        col("__quality") >= cfg.minQuality &&
        col("__rep") <= cfg.maxRepetition
    val filtered = scored.where(passesFilters)
    // 3. exact dedup on the canonical fingerprint (first id wins)
    val exact = Dedup.exactSurvivors(filtered, idCol,
      TextAnalysis.fingerprint(col("__clean")))
    // 4. fuzzy dedup: pairs -> components -> min-id survivors
    val pairs = Dedup.minHashDupPairs(exact, idCol, "__clean",
      cfg.shingleN, cfg.minhashK, cfg.bands, cfg.jaccardThreshold)
    val fuzzy = Dedup.clusterSurvivors(exact, idCol, pairs)
    // 5. decontamination against the held-out corpus
    val decontaminated = eval match {
      case None => fuzzy
      case Some((ev, evId, evText)) =>
        val hits = Dedup.ngramContamination(
          fuzzy.select(col(idCol), col("__clean").as("__text")), idCol,
          ev.select(col(evId).as("__eval_id"), col(evText).as("__text")),
          "__eval_id", "__text", cfg.contaminationN)
          .select(col("test_id").as(idCol)).distinct()
        fuzzy.join(hits, Seq(idCol), "left_anti")
    }
    decontaminated
      .select(col(idCol), col("__clean").as(textCol),
        col("__lang").as("lang_id"), col("__quality").as("quality"))
  }

  /** Per-stage survivor counts for the same funnel — the audit report
    * (each count is one action; the shared prefix recomputes, which is
    * fine for an audit pass, or persist upstream if run repeatedly). */
  def report(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      eval: Option[(DataFrame, String, String)] = None): Seq[(String, Long)] = {
    val clean0 = TextAnalysis.cleanText(col(textCol))
    val cleaned = docs.withColumn("__clean",
      if (cfg.scrubPii) TextAnalysis.redactPii(clean0) else clean0)
    val toks = TextAnalysis.tokens(col("__clean"))
    val filtered = cleaned
      .withColumn("__toks", toks)
      .where(TextAnalysis.langIdFromTokens(col("__toks")).isin(cfg.langs: _*) &&
        size(col("__toks")) >= cfg.minTokens &&
        TextAnalysis.qualityScoreFromTokens(col("__clean"), col("__toks"))
          >= cfg.minQuality &&
        TextAnalysis.repetitionRatio(col("__toks"), 2) <= cfg.maxRepetition)
    val exact = Dedup.exactSurvivors(filtered, idCol,
      TextAnalysis.fingerprint(col("__clean")))
    val fuzzy = Dedup.clusterSurvivors(exact, idCol,
      Dedup.minHashDupPairs(exact, idCol, "__clean",
        cfg.shingleN, cfg.minhashK, cfg.bands, cfg.jaccardThreshold))
    val kept = curate(docs, idCol, textCol, cfg, eval)
    Seq(
      "input" -> docs.count(),
      "filtered" -> filtered.count(),
      "exact_dedup" -> exact.count(),
      "fuzzy_dedup" -> fuzzy.count(),
      "kept" -> kept.count())
  }
}
