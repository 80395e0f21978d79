package graft

import graft.operators._
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- dedup
  test("exact dedup keeps lowest id per identical text") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye"))
      .toDF("id", "text")
    val surv = Dedup.exactSurvivors(df, "id", col("text"))
      .select("id").as[Long].collect().sorted
    assert(surv.toSeq == Seq(1L, 3L))
  }

  test("minhash LSH finds a near-duplicate pair and skips distinct docs") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val b = "the quick brown fox jumps over the lazy dog and runs far away home today"
    val c = "completely different content about spark query engines and data lakes here"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minHashDupPairs(df, "doc_id", "text",
      shingleN = 2, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash estimated verification agrees with exact on clear cases") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val b = "the quick brown fox jumps over the lazy dog and runs far away home today"
    val c = "completely different content about spark query engines and data lakes here"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val est = Dedup.minHashDupPairsEstimated(df, "doc_id", "text",
      shingleN = 2, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(est.contains((1L, 2L)))
    assert(!est.exists(p => p._1 == 3L || p._2 == 3L))
    // slot_matches primitive: positional agreement count, null contract
    import graft.functions.SlotMatches
    val m = Seq((Seq(1L, 2L, 3L), Seq(1L, 9L, 3L))).toDF("x", "y")
      .select(SlotMatches.column(col("x"), col("y"))).as[Int].head()
    assert(m == 2)
    val mm = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("x", "y")
      .select(SlotMatches.column(col("x"), col("y"))).collect().head
    assert(mm.isNullAt(0)) // length mismatch -> null
  }

  test("minHashAccuracyAudit: identical docs audit exactly; err is the signed est-exact gap") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val b = "the quick brown fox jumps over the lazy dog and runs far away home today"
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val rows = Dedup.minHashAccuracyAudit(df, "doc_id", "text",
      shingleN = 2, k = 64, bands = 16).collect()
    // identical docs: identical signatures AND identical shingle sets —
    // the audit must read exactly (1e6, 1e6, 0), anchoring both scales
    val same = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(same.getAs[Long]("est_ppm") == 1000000L &&
      same.getAs[Long]("exact_ppm") == 1000000L &&
      same.getAs[Long]("err_ppm") == 0L)
    // every row: err is exactly the signed difference, scores in range
    rows.foreach { r =>
      val (e, x, d) = (r.getAs[Long]("est_ppm"), r.getAs[Long]("exact_ppm"),
        r.getAs[Long]("err_ppm"))
      assert(d == e - x && e >= 0 && e <= 1000000L && x >= 0 && x <= 1000000L)
    }
    // the near-pair is audited too (candidates are unfiltered)
    assert(rows.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
  }

  test("lshBandingRecall: identical pairs always surface; counts stay within band totals") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val c = "completely different content about spark query engines and data lakes here"
    val e = "entirely unrelated words about gardens flowers bees and honey production"
    val df = Seq((1L, a), (2L, a), (3L, c), (4L, e)).toDF("doc_id", "text")
    val rows = Dedup.lshBandingRecall(df, "doc_id", "text",
      shingleN = 2, k = 64, bands = 16, minJaccardPpm = 0L).collect()
    // identical texts: identical signatures, every band shared — the
    // J=1.0 band must exist and catch at exactly 1.0
    val top = rows.find(_.getAs[Long]("band_ppm") == 1000000L)
    assert(top.isDefined && top.get.getAs[Long]("catch_ppm") == 1000000L,
      s"the identical pair must be caught: ${rows.mkString(";")}")
    // every band: caught is a subset of true pairs, ppm well-formed
    rows.foreach { r =>
      val (n, cgt, p) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_caught"),
        r.getAs[Long]("catch_ppm"))
      assert(cgt >= 0 && cgt <= n && p == (cgt * 1000000L) / n)
    }
    // ground truth covers ALL sample pairs at floor 0 (4 docs -> 6 pairs)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 6L)
  }

  test("ratesFromState: exact integer rates, clip, zero cases; persisted-state drop-in") {
    val state = Seq(("a", 1000L), ("b", 400L), ("c", 0L), ("d", 500L))
      .toDF("source", "total_tokens")
    val rates = Sampling.ratesFromState(state, "source",
        Map("a" -> 500000L, "b" -> 300000L, "c" -> 100000L),
        budgetTokens = 1000L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_ppm"))
      .toMap
    // a: floor(1000·500000/1000)=500000; b: floor(1000·300000/400)=750000
    // c: zero tokens -> 0; d: no target -> 0
    assert(rates == Map("a" -> 500000L, "b" -> 750000L, "c" -> 0L, "d" -> 0L))
    // an unfillable target saturates at 1e6 in DECIMAL space (no
    // long-overflow wrap on the way)
    val clipped = Sampling.ratesFromState(state, "source",
        Map("a" -> 500000L), budgetTokens = Long.MaxValue)
      .where(col("source") === "a")
      .select("rate_ppm").as[Long].head()
    assert(clipped == 1000000L)
    intercept[IllegalArgumentException] {
      Sampling.ratesFromState(state, "source",
        Map("a" -> 600000L, "b" -> 500000L), 10L) // targets sum > 1e6
    }
    // the composed op: a persisted x69 profile state drops in for the
    // inline scoring scan without changing a single survivor
    val docs = (0L until 80L).map { i =>
      (i, ("w " * (1 + (i % 9)).toInt) + s"doc $i", s"s${i % 4}")
    }.toDF("doc_id", "text", "source")
    val targets = Map("s0" -> 400000L, "s1" -> 300000L, "s2" -> 300000L)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("doc_id").as[Long].collect().toSet
    val inline = Sampling.sampleToTokenTarget(docs, "source", "doc_id",
      "text", targets, budgetTokens = 120L)
    val viaState = Sampling.sampleToTokenTarget(docs, "source", "doc_id",
      "text", targets, budgetTokens = 120L,
      state = Some(TextAnalysis.profileState(docs, "source", "text", "doc_id")))
    assert(ids(inline) == ids(viaState) && ids(inline).nonEmpty)
    // untargeted s3 drops entirely; survivors carry their rate
    assert(inline.where(col("source") === "s3").count() == 0)
    assert(inline.columns.contains("rate_ppm"))
  }

  test("tokenBudgetPerGroup: chunked prefix equals the naive window; zero cost never consumes budget") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 400L)
      .map(i => (i, s"s${i % 3}", if (i % 7 == 0) 0L else (i % 50) + 10L))
      .toDF("id", "grp", "cost")
    val got = Sampling.tokenBudgetPerGroup(df, "grp", "id", "cost",
        budget = 300L, salt = "t")
      .select("id").as[Long].collect().toSet
    // the naive form the chunked path must reproduce exactly: one
    // running-sum window per group in (draw, id) order
    val draw = conv(substring(
        md5(concat_ws(":", col("id").cast("string"), lit("t"))), 1, 13),
      16, 10).cast("long")
    val w = Window.partitionBy("grp").orderBy(draw, col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = df.withColumn("__run", sum(coalesce(col("cost"), lit(0L))).over(w))
      .where(col("__run") <= 300L)
      .select("id").as[Long].collect().toSet
    assert(got == naive, s"chunked != naive: ${got.diff(naive)} / ${naive.diff(got)}")
    assert(got.nonEmpty && got.size < 400, "the budget must actually cut")
    // budget 0: only zero-cost docs ahead of the first positive cost survive
    val zero = Sampling.tokenBudgetPerGroup(df, "grp", "id", "cost", 0L, "t")
    assert(zero.where(col("cost") > 0).count() == 0)
  }

  test("stripFrequentChunks: over-df chunks vanish everywhere; within-doc repetition is not frequency") {
    // "alpha beta gamma" lives in docs 1,2,3 (df=3 > maxDf=2): every
    // copy must die, including the first. "delta epsilon zeta" lives
    // in docs 1,4 (df=2): stays. Doc 5 repeats one chunk three times
    // WITHIN itself (df=1): stays — style, not boilerplate.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma own words here"),
      (3L, "alpha beta gamma more private text"),
      (4L, "delta epsilon zeta and something else"),
      (5L, "rho sigma tau rho sigma tau rho sigma tau"))
      .toDF("doc_id", "text")
    val out = Dedup.stripFrequentChunks(df, "doc_id", "text",
      chunkTokens = 3, maxDf = 2)
    val byId = out.collect().map(r =>
      r.getLong(0) -> r.getAs[String]("text_stripped")).toMap
    assert(!byId.values.exists(_.contains("alpha beta gamma")),
      s"the df=3 chunk must vanish from every doc: $byId")
    assert(byId(1L) == "delta epsilon zeta" && byId(4L).startsWith("delta epsilon zeta"),
      s"the df=2 chunk must survive in both docs: $byId")
    assert(byId(5L) == "rho sigma tau rho sigma tau rho sigma tau",
      s"within-doc repetition must not count toward df: $byId")
    // doc 2 and 3 keep only their private tails
    assert(byId(2L) == "own words here" && byId(3L) == "more private text")
  }

  test("vocabularyCoverage: rank by occurrence, cumulative ppm is exact integer floor") {
    // 10 tokens total: "aa" x5, "bb" x3, "cc" x2
    val df = Seq((1L, "aa aa aa bb bb"), (2L, "aa aa bb cc cc"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabularyCoverage(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "aa", 5L, 500000L), (2, "bb", 3L, 800000L)),
      s"got ${out.toSeq}")
  }

  test("collocations: sticky pairs outrank frequent-but-independent ones; minCount prunes hapax pairs") {
    // "santa monica" always co-occurs (lift >> 1); "the cat"/"the dog"
    // split "the"'s mass (lift ~ 1); a pair appearing once dies to
    // minCount regardless of lift
    val sticky = (1 to 6).map(i => (i.toLong, "santa monica beach visit"))
    val indep = (7 to 12).map(i =>
      (i.toLong, if (i % 2 == 0) "the cat sat here" else "the dog sat here"))
    val hapax = Seq((13L, "unique singleton pairing"))
    // extra "the" contexts dilute its mass without touching "the cat"
    val dilute = Seq((14L, "the bird flew over the town"),
      (15L, "the rain fell on the roof"))
    val df = (sticky ++ indep ++ hapax ++ dilute).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, "doc_id", "text", k = 50, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    val pairs = out.map(t => (t._1, t._2))
    assert(pairs.contains(("santa", "monica")))
    assert(!pairs.contains(("unique", "singleton")),
      "a once-seen pair must die to minCount")
    val lift = out.map(t => ((t._1, t._2), t._3)).toMap
    assert(lift(("santa", "monica")) > lift(("the", "cat")),
      s"the always-together pair must outrank the split-mass pair: $lift")
    // ranking is (lift desc, pair asc) — a total order
    assert(out.sortBy(t => (-t._3, t._1, t._2)).toSeq == out.toSeq)
  }

  test("stripEvalSpans: only eval-shared spans are cut; within-corpus repeats and short eval items pass") {
    val eval = Seq(
      (1L, "benchmark question about riemann zeta function zeros"),
      (2L, "tiny item"))  // < n tokens: no span, drop tier's job
      .toDF("eval_id", "text")
    val corpus = Seq(
      // quotes the eval item mid-doc: only the quoted span dies
      (10L, Some("own intro then benchmark question about riemann zeta function zeros and own outro")),
      // repeats ITSELF (no eval overlap): surgical decon must NOT touch it
      (11L, Some("aa bb cc dd ee aa bb cc dd ee")),
      (12L, Some("tiny item repeated")),  // shares only sub-n text: untouched
      (13L, None))
      .toDF("doc_id", "text")
    val out = Dedup.stripEvalSpans(corpus, "doc_id", "text", eval, "text", n = 5)
    val m = out.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), r.getLong(3)))).toMap
    assert(m(10L) == ((Some("own intro then and own outro"), 7L)),
      s"only the quoted eval span may die: $m")
    assert(m(11L) == ((Some("aa bb cc dd ee aa bb cc dd ee"), 0L)),
      "within-corpus duplication is not contamination")
    assert(m(12L) == ((Some("tiny item repeated"), 0L)),
      "sub-n eval overlap is the drop tier's job, not a span cut")
    assert(m(13L) == ((None, 0L)))
  }

  test("stripDuplicateSpans: non-keeper occurrences vanish, overlaps union, short/null docs pass through") {
    // the 5-token span "one two three four five" lives in docs 1, 2, 8:
    // the minimal (doc, pos) copy (doc 1) survives, every other copy is
    // cut. Doc 3 repeats a span WITHIN itself (first copy kept). Docs
    // 6/7 share an 8-token run: doc 7's four overlapping marked grams
    // union into one 8-token cut. Doc 4 is shorter than n (no span
    // exists); doc 5 is null text. Doc 8 checks tokenizer normalization
    // (case/punctuation) feeds the same span keys.
    val df = Seq(
      (1L, Some("one two three four five unique tail")),
      (2L, Some("prefix words one two three four five suffix")),
      (3L, Some("aa bb cc dd ee xx aa bb cc dd ee")),
      (4L, Some("tiny little doc")),
      (5L, None),
      (6L, Some("p q r s t u v w")),
      (7L, Some("zz p q r s t u v w yy")),
      (8L, Some("Hello, World! ONE TWO THREE FOUR FIVE.")))
      .toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(df, "doc_id", "text", n = 5)
    assert(out.columns.toSeq == Seq("doc_id", "text", "n_tokens", "n_removed"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((Some("one two three four five unique tail"), 7L, 0L)),
      s"the keeper copy must survive intact: $m")
    assert(m(2L) == ((Some("prefix words suffix"), 8L, 5L)))
    assert(m(3L) == ((Some("aa bb cc dd ee xx"), 11L, 5L)),
      "within-doc repeats keep only the first copy")
    assert(m(4L) == ((Some("tiny little doc"), 3L, 0L)))
    assert(m(5L) == ((None, 0L, 0L)))
    assert(m(6L) == ((Some("p q r s t u v w"), 8L, 0L)))
    assert(m(7L) == ((Some("zz yy"), 10L, 8L)),
      s"overlapping marked spans must union, not double-count: $m")
    assert(m(8L) == ((Some("hello world"), 7L, 5L)),
      "normalized tokens must share span keys with plain ones")
  }

  test("contaminationReport: a copied eval item reads 1.0 containment; clean items surface as zero rows") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated corpus text about engines and data lakes"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "pristine benchmark question nobody has ever trained on yet"))
      .toDF("doc_id", "text")
    val rows = Dedup.contaminationReport(corpus, "doc_id", "text",
        eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val hit = rows(100L)
    assert(hit.getAs[Long]("worst_ppm") == 1000000L &&
      hit.getAs[Long]("worst_doc") == 1L &&
      hit.getAs[Long]("n_hit_docs") == 1L,
      s"an exact copy must read full containment against its source: $hit")
    val clean = rows(101L)
    assert(clean.getAs[Long]("n_hit_docs") == 0L &&
      clean.getAs[Long]("worst_ppm") == 0L && clean.isNullAt(4),
      s"a clean item must surface with zero evidence, not vanish: $clean")
  }

  test("weightedMixture + epochShuffleKey: reproducible mix, independent epochs") {
    val a = (0L until 100L).map((_, "a")).toDF("id", "src").drop("src")
    val b = (100L until 200L).map((_, "b")).toDF("id", "src").drop("src")
    val mix = Sampling.weightedMixture(Seq(("a", a, 1.0), ("b", b, 0.3)), "id")
    val n = mix.count()
    // full source a + ~30% of b (deterministic, so an exact count)
    assert(n > 100 && n < 160)
    // rerun = identical survivor set (auditability contract)
    val again = Sampling.weightedMixture(Seq(("a", a, 1.0), ("b", b, 0.3)), "id")
    assert(mix.exceptAll(again).count() == 0)
    // same epoch = same order anywhere; different epochs = different order
    val k1 = mix.select(col("id"), Sampling.epochShuffleKey("id", 1).as("k"))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val k1b = mix.repartition(7)
      .select(col("id"), Sampling.epochShuffleKey("id", 1).as("k"))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val k2 = mix.select(col("id"), Sampling.epochShuffleKey("id", 2).as("k"))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    assert(k1 == k1b)
    assert(k1 != k2 && k1.toSet == k2.toSet)
  }

  test("packSequences: offsets contiguous within chunk, seq boundaries respect budget") {
    val docs = (0L until 200L).map(i => (i, 100L + i % 7)).toDF("id", "tc")
    val packed = Sampling.packSequences(docs, "id", "tc",
      budget = 512, epoch = 3, chunks = 4)
    // per chunk: offsets form an exact prefix-sum chain (no gaps/overlaps)
    val rows = packed.select("chunk", "start_off", "tc", "seq")
      .as[(Int, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      var expect = 0L
      sorted.foreach { case (_, off, tc, seq) =>
        assert(off == expect, s"gap at offset $off, expected $expect")
        assert(seq == off / 512)
        expect = off + tc
      }
    }
    // deterministic across partitionings
    val again = Sampling.packSequences(docs.repartition(13), "id", "tc",
      budget = 512, epoch = 3, chunks = 4)
    assert(packed.exceptAll(again).count() == 0)
  }

  test("dupClusters: min-label components; clusterSurvivors keeps minima + singletons") {
    // components: {1,2,3} (chain), {7,9}; 5 untouched by any pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val labels = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val docs = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val surv = Dedup.clusterSurvivors(docs, "doc_id", pairs)
      .as[Long].collect().sorted.toSeq
    assert(surv == Seq(1L, 5L, 7L))
  }

  test("bestSurvivorPerCluster: max score wins, ties -> min id, singletons kept") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 10), (2L, 30), (3L, 30), (5L, 5), (7L, 4), (9L, 2))
      .toDF("doc_id", "n_chars")
    val picked = Dedup.bestSurvivorPerCluster(docs, "doc_id", "n_chars", pairs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // family 1: 2 and 3 tie at 30 -> min id 2; family 7: 7 (4 > 2);
    // 5 is its own singleton
    assert(picked == Seq((1L, 2L, 3L), (5L, 5L, 1L), (7L, 7L, 2L)))
  }

  test("bestSurvivorPerCluster: null scores rank below any non-null; all-null family -> min id") {
    val pairs = Seq((1L, 2L), (7L, 9L)).toDF("id_a", "id_b")
    val docs = Seq((1L, None), (2L, Some(1)), (7L, None), (9L, None))
      .toDF("doc_id", "n_chars")
    val picked = Dedup.bestSurvivorPerCluster(docs, "doc_id", "n_chars", pairs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(picked == Seq((1L, 2L, 2L), (7L, 7L, 2L)))
  }

  test("profileState merge: grown == one-shot, associative, order-free") {
    val docs = (0L until 60L).map { i =>
      val text = if (i % 17 == 0) null
        else s"the quick document number $i with some plain text and ${"x" * (i % 7).toInt} tail"
      (i, text, s"s${i % 3}", Option(text).map(_.length).getOrElse(0))
    }.toDF("doc_id", "text", "source", "n_chars")
    def report(st: org.apache.spark.sql.DataFrame): Seq[String] =
      TextAnalysis.profileFromState(st, "source")
        .orderBy("source").collect().map(_.toString).toSeq
    val batches = Seq(
      docs.where(col("doc_id") < 20),
      docs.where(col("doc_id") >= 20 && col("doc_id") < 40),
      docs.where(col("doc_id") >= 40))
    val st = batches.map(TextAnalysis.profileState(_, "source", "text", "n_chars"))
    val oneShot = report(TextAnalysis.profileState(docs, "source", "text", "n_chars"))
    val leftFold = report(TextAnalysis.mergeProfileStates("source",
      Seq(TextAnalysis.mergeProfileStates("source", Seq(st(0), st(1))), st(2))))
    val rightFold = report(TextAnalysis.mergeProfileStates("source",
      Seq(st(0), TextAnalysis.mergeProfileStates("source", Seq(st(1), st(2))))))
    val reordered = report(TextAnalysis.mergeProfileStates("source",
      Seq(st(2), st(0), st(1))))
    assert(leftFold == oneShot)
    assert(rightFold == oneShot)
    assert(reordered == oneShot)
  }

  test("profileHistState merge: grown == one-shot; quantile estimate within one bin of exact") {
    val bins = 64
    val docs = (0L until 90L).map { i =>
      val text = if (i % 13 == 0) null
        else ("word " * (1 + (i % 11)).toInt) + s"doc $i " + ("!" * (i % 5).toInt)
      (i, text, s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    def canon(st: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      st.as[(String, Long, Long)].collect().toSet
    val batches = Seq(
      docs.where(col("doc_id") < 30),
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60),
      docs.where(col("doc_id") >= 60))
    val st = batches.map(TextAnalysis.profileHistState(_, "source", "text", bins))
    val oneShot = canon(TextAnalysis.profileHistState(docs, "source", "text", bins))
    val leftFold = canon(TextAnalysis.mergeHistStates("source",
      Seq(TextAnalysis.mergeHistStates("source", Seq(st(0), st(1))), st(2))))
    val reordered = canon(TextAnalysis.mergeHistStates("source",
      Seq(st(2), st(0), st(1))))
    assert(leftFold == oneShot)
    assert(reordered == oneShot)

    // one-bin-error theorem: for every (group, p) the exact nearest-rank
    // order statistic v of the binned (4dp-floored) qualities satisfies
    // q_est <= v < q_est + 1/bins
    val ps = Seq(0.25, 0.5, 0.75)
    val merged = TextAnalysis.mergeHistStates("source", st)
    val est = TextAnalysis.histQuantiles(merged, "source", bins, ps)
      .as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    val quals = docs
      .withColumn("__stats", TextAnalysis.docStats(col("text")))
      .withColumn("__q", floor(
        TextAnalysis.qualityScoreFromStats(col("text"), col("__stats")) * 10000) / 10000)
      .where(col("__q").isNotNull)
      .select(col("source"), col("__q")).as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    assert(est.keySet == (for (g <- quals.keySet; p <- ps) yield (g, p)).toSet)
    for (((g, p), qEst) <- est) {
      val xs = quals(g)
      val v = xs(math.ceil(p * xs.length).toInt - 1) // nearest-rank, 1-indexed
      assert(qEst <= v && v < qEst + 1.0 / bins,
        s"group $g p=$p: est $qEst vs exact $v")
    }
  }

  test("profileHistDrift: identical -> 0; one-sided group -> 1; tv in [0,1]") {
    val docs = (0L until 60L).map { i =>
      (i, ("tok " * (1 + (i % 9)).toInt) + s"doc $i", s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val full = TextAnalysis.profileHistState(docs, "source", "text", 64)
    val same = TextAnalysis.profileHistDrift(full, full, "source")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(same.length == 3 && same.forall(r => r._4 == 0.0 && r._2 == r._3))
    // drop s2 from snapshot B: complete drift for s2, counts carried
    val histB = TextAnalysis.profileHistState(
      docs.where(col("source") =!= "s2"), "source", "text", 64)
    val drift = TextAnalysis.profileHistDrift(full, histB, "source")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    val s2 = drift.find(_._1 == "s2").get
    assert(s2._4 == 1.0 && s2._3 == 0L && s2._2 == 20L)
    assert(drift.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // shifting a distribution moves tv strictly above 0
    val skew = TextAnalysis.profileHistState(
      docs.where(col("doc_id") % 2 === 0), "source", "text", 64)
    val moved = TextAnalysis.profileHistDrift(full, skew, "source")
      .as[(String, Long, Long, Double)].collect()
    assert(moved.exists(_._4 > 0.0))
  }

  test("familySizeHistogram: exact integer log2 buckets, mass conserved") {
    // families {1,2,3} size 3, {5,6} size 2 (both bits=2), {7,8,9,10}
    // size 4 (bits=3)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (8L, 9L), (9L, 10L))
      .toDF("id_a", "id_b")
    val hist = Dedup.familySizeHistogram(pairs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(hist == Seq((2L, 2L, 5L), (3L, 1L, 4L)))
  }

  test("arrayJaccard exact values") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.arrayJaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-15) // |{b,c}| / |{a,b,c,d}|
  }

  test("simhash: identical text -> distance 0; near text -> small distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val fp = Dedup.simHashes(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    val d12 = java.lang.Long.bitCount(fp(1L) ^ fp(2L))
    assert(d12 > 0 && d12 <= 16)
  }

  test("ngram jaccard pairs respect blocking and threshold") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "en", "s1"),
      (2L, "alpha beta gamma epsilon", "en", "s1"),
      (3L, "alpha beta gamma delta", "en", "s2"), // same text, different block
      (4L, "unrelated words entirely", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 1, 0.5, Seq("lang", "source"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  // -------------------------------------------------------- similarity
  test("cosine: identity = 1, orthogonal = 0") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(1f, 0f, 2f), Seq(0f, 3f, 0f))).toDF("a", "b", "c")
    val (same, orth) = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).as[(Double, Double)].head()
    assert(math.abs(same - 1.0) < 1e-12 && math.abs(orth) < 1e-12)
  }

  test("bruteForceTopK returns the true nearest neighbors in rank order") {
    val corpus = Seq(
      (10L, Seq(1f, 0f)), (11L, Seq(0.9f, 0.1f)), (12L, Seq(0f, 1f)), (13L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1f, 0f))).toDF("q_id", "q_vec")
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L))
  }

  test("bucketed ANN: same vector lands in own bucket and is found") {
    // vectors [8i..8i+7] are pairwise non-parallel, so only vec 7
    // itself has cosine exactly 1.0 with the query
    val corpus = (0 until 50).map(i => (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") === 7)
      .select((col("vec_id") * 1000).as("q_id"), col("embedding").as("q_vec"))
    val got = Similarity.bucketedTopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", dim = 8, k = 1, planes = 2)
      .select("neighbor_id").as[Long].collect()
    assert(got.headOption.contains(7L)) // exact self copy is rank 1
  }

  // ------------------------------------------------------ text analysis
  test("langId picks stopword-majority language; und when no hits") {
    val df = Seq(
      (1L, "the cat and the dog is in that house"),
      (2L, "le chat est dans la maison et les jardins"),
      (3L, "xyzzy qwerty plugh"))
      .toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "fr" && got(3L) == "und")
  }

  test("token counts: whitespace and bpe-ish") {
    val df = Seq(Tuple1("Hello, world! It's 42 degrees.")).toDF("text")
    val (ws, bpe) = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeTokenCount(col("text"))).as[(Int, Int)].head()
    assert(ws == 6) // hello world it s 42 degrees
    assert(bpe >= 8) // word pieces + punctuation runs + contraction split
  }

  test("quality score is in [0,1] and favors real sentences over noise") {
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and it was a fine day for running in the park with friends and family members."),
      (2L, "@@@@ ???? !!!! %%%% ####"))
      .toDF("id", "text")
    val q = df.select(col("id"), TextAnalysis.qualityScore(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0 && v <= 1))
    assert(q(1L) > q(2L))
  }

  test("fingerprint collapses case/punctuation variants; rollingHash deterministic") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "goodbye"))
      .toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")),
      TextAnalysis.rollingHash(col("text"))).as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  // ------------------------------------------------------------- as-of
  test("asOf join matches latest right row at or before left time") {
    val left = Seq((1L, 100L, 10L), (2L, 205L, 10L), (3L, 50L, 10L), (4L, 100L, 99L))
      .toDF("event_id", "t", "k")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt")
      .select("event_id", "payload").as[(Long, String)].collect().toMap
    assert(got(1L) == "a")  // boundary: rt == t matches (inclusive)
    assert(got(2L) == "b")  // latest of the two
    assert(got(3L) == null) // before any right row
    assert(got(4L) == null) // key with no right rows
  }

  test("groupCentroids: exact per-dimension means in order") {
    val df = Seq(
      (0L, Seq(1f, 10f)), (0L, Seq(3f, 30f)), (1L, Seq(5f, 50f)))
      .toDF("g", "v")
    val got = Similarity.groupCentroids(df, "g", "v")
      .orderBy("g").as[(Long, Seq[Double])].collect().toSeq
    assert(got == Seq((0L, Seq(2.0, 20.0)), (1L, Seq(5.0, 50.0))))
  }

  // -------------------------------------------------------- multimodal
  test("multimodal: format sniffing recovers magic-byte formats; unknown otherwise") {
    val docs = Seq((1L, "hello"), (2L, "world wide"), (3L, "x"), (4L, "abcdef"))
      .toDF("doc_id", "text")
    val sniffed = Multimodal.packFakeWithMagic(docs, "doc_id", "text")
      .select(col("meta.format").as("declared"),
        Multimodal.sniffFormat(col("media")).as("sniffed"))
      .where(col("declared") =!= col("sniffed")).count()
    assert(sniffed == 0)
    // magic-less payloads sniff as unknown
    val unk = Multimodal.packFake(docs, "doc_id", "text")
      .select(Multimodal.sniffFormat(col("media")).as("s"))
      .where(col("s") =!= "unknown").count()
    assert(unk == 0)
  }

  test("multimodal: imageDims parses real PNG/GIF headers byte-exactly; others null") {
    // hand-built headers: width 260 (0x0104), height 3
    val png = "89504E470D0A1A0A0000000D49484452" + "00000104" + "00000003" + "08"
    val gif = "474946383961" + "0401" + "0300" + "F7"
    val jpg = "FFD8FFE0ABCD"
    val df = Seq((1L, png), (2L, gif), (3L, jpg), (4L, "89504E47"))
      .toDF("id", "h")
      .select(col("id"), unhex(col("h")).as("media"))
      .select(col("id"), Multimodal.imageDims(col("media")).as("d"))
      .orderBy("id").collect()
    assert(df(0).getStruct(1).getLong(0) == 260L &&
      df(0).getStruct(1).getLong(1) == 3L, "PNG big-endian IHDR")
    assert(df(1).getStruct(1).getLong(0) == 260L &&
      df(1).getStruct(1).getLong(1) == 3L, "GIF little-endian descriptor")
    assert(df(2).isNullAt(1), "JPEG has no fixed-offset dims -> null")
    assert(df(3).isNullAt(1), "truncated PNG -> null")
    // the synth pack round-trips: parse(synthesize(dims)) == dims
    val packed = Multimodal.packFakeImages(
      Seq(10L, 11L, 1919L, 0L).toDF("doc_id"), "doc_id")
    val rt = packed.select(col("media_id"),
        Multimodal.imageDims(col("media")).as("d")).orderBy("media_id").collect()
    rt.foreach { r =>
      val id = r.getLong(0)
      assert(r.getStruct(1).getLong(0) == id % 1920 + 16 &&
        r.getStruct(1).getLong(1) == (id * 7) % 1080 + 16,
        s"round-trip failed for id $id: ${r.getStruct(1)}")
    }
  }

  test("Bloom: no false negatives ever; grown == one-shot; measured FP inside the sizing band") {
    import graft.operators.Bloom
    val k = 5
    val bits = 1L << 14 // small on purpose: a measurable FP rate
    val members = (0 until 800).map(i => s"member-$i").toDF("t")
    val filter = Bloom.build(members, col("t"), k, bits).cache()
    // 1. NO FALSE NEGATIVES: every built term must read maybe_present
    val fn = Bloom.probe(filter, members, col("t"), k, bits)
      .where(!col("maybe_present")).count()
    assert(fn === 0L, "a Bloom filter may never miss a member")
    // 1b. and that holds for a NON-DEDUPED filter relation too (a raw
    //     appended sidecar carries duplicate bit rows; a dup must not
    //     inflate the hit count past k and flip a member to absent)
    val fnDup = Bloom.probe(filter.union(filter), members, col("t"), k, bits)
      .where(!col("maybe_present")).count()
    assert(fnDup === 0L,
      "duplicate filter rows must not produce false negatives")
    // 2. mergeable: filters over a split input union to the one-shot
    val (a, b) = ((0 until 400), (400 until 800))
    val grown = Bloom.merge(Seq(
      Bloom.build(a.map(i => s"member-$i").toDF("t"), col("t"), k, bits),
      Bloom.build(b.map(i => s"member-$i").toDF("t"), col("t"), k, bits)))
    assert(grown.orderBy("bit").collect().toSeq ==
      filter.orderBy("bit").collect().toSeq,
      "union of split filters must equal the one-shot filter")
    // 3. measured FP sits inside the sizing band: FP ≈ fill^k, check
    //    within a generous factor (the audit exists to MEASURE it)
    val audit = Bloom.fpAudit(filter,
      (0 until 4000).map(i => s"stranger-$i").toDF("t"), col("t"),
      k, bits).collect()(0)
    val fill = audit.getAs[Long]("fill_ppm").toDouble / 1e6
    val fp = audit.getAs[Long]("fp_ppm").toDouble / 1e6
    val theory = math.pow(fill, k)
    assert(audit.getAs[Long]("n_absent") === 4000L)
    assert(fp <= theory * 3 + 0.001 && fp >= theory / 5 - 0.001,
      s"measured FP $fp far from theory $theory (fill $fill)")
    filter.unpersist()
  }

  test("Kmv: grown == one-shot; sub-k is exact; estimate lands; set ops hit the degenerate poles") {
    import graft.operators.Kmv
    val k = 128
    // 1. small set (< k distinct): the sketch IS the hash set — exact
    val small = (0 until 50).map(i => s"v-$i").toDF("t")
    val smallEst = Kmv.distinctEstimate(Kmv.build(small, col("t"), k), k).collect()(0)
    assert(smallEst.getAs[Long]("n_held") === 50L)
    assert(smallEst.getAs[Long]("kmv_est") === 50L,
      "below k the count must be exact")
    // 2. grown == one-shot: union of split sketches re-bottom-k's to
    //    the sketch of the whole input, row-identically
    val big = (0 until 20000).map(i => s"key-$i").toDF("t")
    val oneShot = Kmv.build(big, col("t"), k)
    val grown = Kmv.merge(Seq(
      Kmv.build((0 until 7000).map(i => s"key-$i").toDF("t"), col("t"), k),
      Kmv.build((7000 until 20000).map(i => s"key-$i").toDF("t"), col("t"), k)), k)
    assert(grown.orderBy("hv").collect().toSeq ==
      oneShot.orderBy("hv").collect().toSeq)
    // 3. the estimator lands: 20k distinct, k=128 → s.e. ≈ n/√k ≈ 9%;
    //    assert a generous deterministic band (hashes are fixed)
    val est = Kmv.distinctEstimate(oneShot, k).collect()(0).getAs[Long]("kmv_est")
    assert(est > 12000 && est < 30000, s"estimate $est far from 20000")
    // 4. degenerate poles of the set ops: identical sets → jaccard
    //    exactly 1e6 ppm; disjoint sets → k_both = 0, intersect 0
    val same = Kmv.setOps(oneShot, Kmv.build(big, col("t"), k), k).collect()(0)
    assert(same.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(same.getAs[Long]("union_est") === est)
    val other = (0 until 20000).map(i => s"elsewhere-$i").toDF("t")
    val disj = Kmv.setOps(oneShot, Kmv.build(other, col("t"), k), k).collect()(0)
    assert(disj.getAs[Long]("k_both") === 0L)
    assert(disj.getAs[Long]("intersect_est") === 0L)
    // 5. a half-overlap reads between the poles
    val half = (10000 until 30000).map(i => s"key-$i").toDF("t")
    val ho = Kmv.setOps(oneShot, Kmv.build(half, col("t"), k), k).collect()(0)
    val jac = ho.getAs[Long]("jaccard_ppm")
    assert(jac > 150000L && jac < 550000L, // true 10k/30k ≈ 333333 ppm
      s"half-overlap jaccard $jac far from 333333")
  }

  test("Kmv grouped: BottomKLongs equals the per-subset one-shot; the overlap matrix hits every pole") {
    import graft.operators.Kmv
    val k = 64
    // four groups over a shared key universe: identical pair, a
    // disjoint stranger, and a half-overlapper — every matrix pole
    val rows =
      (0 until 3000).map(i => ("g0", s"key-$i")) ++
      (0 until 3000).map(i => ("g1", s"key-$i")) ++          // == g0
      (0 until 3000).map(i => ("gx", s"other-$i")) ++        // disjoint
      (1500 until 4500).map(i => ("gh", s"key-$i"))          // half of g0
    val df = rows.toDF("g", "t")
    val sk = Kmv.groupedBuild(df, col("g"), col("t"), k).cache()
    // 1. the native bounded aggregate must equal the per-subset
    //    one-shot build, row-identically, for every group
    for (g <- Seq("g0", "g1", "gx", "gh")) {
      val grouped = sk.where(col("g") === g).select("hv")
        .orderBy("hv").collect().toSeq
      val oneShot = Kmv.build(df.where(col("g") === g), col("t"), k)
        .orderBy("hv").collect().toSeq
      assert(grouped == oneShot, s"grouped sketch for $g diverges")
    }
    // 2. matrix poles: identical → jaccard exactly 1e6 and k_both ==
    //    n_held; disjoint → zero overlap; half → between the poles
    val m = Kmv.pairwiseOverlap(sk, k).collect()
      .map(r => (r.getAs[String]("ga"), r.getAs[String]("gb")) -> r).toMap
    assert(m.size == 6, s"expected all 6 unordered pairs, got ${m.keySet}")
    val same = m(("g0", "g1"))
    assert(same.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(same.getAs[Long]("k_both") === same.getAs[Long]("n_held"))
    val disj = m(("g0", "gx"))
    assert(disj.getAs[Long]("k_both") === 0L)
    assert(disj.getAs[Long]("intersect_est") === 0L)
    val half = m(("g0", "gh"))
    val jac = half.getAs[Long]("jaccard_ppm")
    assert(jac > 150000L && jac < 550000L, // true 1.5k/4.5k ≈ 333333
      s"half-overlap matrix jaccard $jac far from 333333")
    // 3. union estimate on the half pair lands near the true 4500
    val ue = half.getAs[Long]("union_est")
    assert(ue > 2500 && ue < 8000, s"union estimate $ue far from 4500")
    // 4. per-group NDV from the same sketch relation: every group
    //    holds 3000 distinct keys; estimates land in the k=64 band
    val ndv = Kmv.groupedDistinct(sk, k).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("ndv_est")).toMap
    assert(ndv.keySet == Set("g0", "g1", "gx", "gh"))
    ndv.foreach { case (g, est) =>
      assert(est > 1500 && est < 6000, s"group $g NDV $est far from 3000")
    }
    assert(ndv("g0") == ndv("g1"), "identical groups must estimate identically")
    sk.unpersist()
  }

  test("multimodal: REAL PNG decode — every filter type round-trips byte-exactly; malformed screened") {
    // one image per filter type: encode with predictor f on every
    // row, decode, compare to the direct pixel formula — any filter
    // math or zlib-assembly defect breaks byte equality
    (0 to 4).foreach { f =>
      val w = 13; val h = 9
      def pix(x: Int, y: Int): Int = (x * 7 + y * 13 + f * 31) % 256
      val bytes = Multimodal.buildPng(w, h, pix, _ => f)
      val decoded = Multimodal.decodePng(bytes)
      assert(decoded.isDefined, s"filter $f failed to decode")
      val (dw, dh, bpp, pxs) = decoded.get
      assert(dw == w && dh == h && bpp == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((pxs(y * w + x) & 0xff) == pix(x, y),
          s"filter $f pixel ($x,$y) mismatch")
    }
    // mixed per-row filters (the packRealPngs shape) round-trip too
    val mixed = Multimodal.buildPng(20, 16,
      (x, y) => (x * 3 + y * 5) % 256, r => r % 5)
    val (mw, mh, _, mp) = Multimodal.decodePng(mixed).get
    assert(mw == 20 && mh == 16 && (mp(5 * 20 + 7) & 0xff) == (7 * 3 + 5 * 5) % 256)
    // malformed payloads screen out instead of throwing: bad magic,
    // truncated IDAT, unsupported bit depth
    assert(Multimodal.decodePng("nope".getBytes).isEmpty)
    assert(Multimodal.decodePng(mixed.take(40)).isEmpty)
    assert(Multimodal.decodePng(mixed.dropRight(30).take(60)).isEmpty)
    // the distributed stats operator agrees with a driver-side count
    val stats = Multimodal.pngPixelStats(spark,
        Multimodal.packRealPngs(spark, Seq(3L, 8L, 42L).toDF("doc_id"),
          "doc_id"))
      .orderBy("media_id").collect()
    Seq(3L, 8L, 42L).zip(stats).foreach { case (id, r) =>
      val w = (id % 16 + 4).toInt; val h = ((id * 7) % 12 + 4).toInt
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 13) % 256).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(3) == w.toLong * h)
      assert(r.getLong(4) == vals.map(_.toLong).sum, s"sum for id $id")
      assert(r.getLong(5) == vals.max.toLong)
      assert(r.getLong(6) == vals.count(_ > 127).toLong)
    }
  }

  test("multimodal: encodePng round-trips all bpp; REAL resize is the exact NN resample") {
    // encode→decode round-trip for every supported channel count,
    // with value patterns the deflate loop can't shortcut
    Seq(1, 3, 4).foreach { bpp =>
      val w = 11; val h = 7
      val pix = Array.tabulate(w * h * bpp)(i =>
        ((i * 197 + bpp * 89) % 256).toByte)
      val decoded = Multimodal.decodePng(Multimodal.encodePng(w, h, bpp, pix))
      assert(decoded.isDefined, s"bpp $bpp failed to decode")
      val (dw, dh, dbpp, out) = decoded.get
      assert(dw == w && dh == h && dbpp == bpp)
      assert(out.sameElements(pix), s"bpp $bpp pixels differ")
    }
    // the distributed resize: every output pixel must equal the
    // nearest-neighbor source pixel by the integer formula
    val ids = Seq(3L, 8L, 42L)
    val resized = Multimodal.resizePng(spark,
        Multimodal.packRealPngs(spark, ids.toDF("doc_id"), "doc_id"),
        w = 8, h = 6)
      .orderBy("media_id").collect()
    ids.zip(resized).foreach { case (id, r) =>
      val sw = (id % 16 + 4).toInt; val sh = ((id * 7) % 12 + 4).toInt
      val (dw, dh, bpp, pix) =
        Multimodal.decodePng(r.getAs[Array[Byte]]("media")).get
      assert(dw == 8 && dh == 6 && bpp == 1)
      for (y <- 0 until 6; x <- 0 until 8) {
        val expect = ((id * 31 + (x * sw / 8) * 7 + (y * sh / 6) * 13) % 256).toInt
        assert((pix(y * 8 + x) & 0xff) == expect,
          s"id $id resized pixel ($x,$y)")
      }
    }
    // undecodable payloads screen out of the resize, not throw
    assert(Multimodal.resizePng(spark,
      Seq((1L, "junk".getBytes)).toDF("media_id", "media"), 4, 4).count() == 0)
  }

  test("multimodal: REAL WAV PCM decode — round-trip exact, aligned chunk walk, screens non-PCM") {
    // encode→decode round-trip including negative samples (sign
    // extension) and the full clipping range
    val samples = Array.tabulate(33)(i =>
      ((i * 4099 - 32768 + i % 2) % 32768).toShort)
    val decoded = Multimodal.decodeWavSamples(
      Multimodal.buildWav(16000, samples))
    assert(decoded.isDefined)
    val (rate, ch, out) = decoded.get
    assert(rate == 16000 && ch == 1 && out.sameElements(samples))
    // an ODD-sized unknown chunk before data must be skipped with the
    // spec's pad byte — misalignment would corrupt every sample after
    val base = Multimodal.buildWav(8000, samples)
    val withChunk = {
      val extra = java.nio.ByteBuffer.allocate(8 + 3 + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      extra.put("LIST".getBytes("US-ASCII")).putInt(3)
        .put(Array[Byte](1, 2, 3, 0))
      val (head, tail) = base.splitAt(12)
      val riffLen = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(base.length - 8 + 12).array()
      head.take(4) ++ riffLen ++ head.drop(8) ++ extra.array() ++ tail
    }
    val aligned = Multimodal.decodeWavSamples(withChunk)
    assert(aligned.isDefined && aligned.get._3.sameElements(samples),
      "odd-sized chunk must be skipped word-aligned")
    // screens: non-PCM format code, truncated payloads, junk
    val nonPcm = base.clone(); nonPcm(20) = 3 // IEEE float format
    assert(Multimodal.decodeWavSamples(nonPcm).isEmpty)
    assert(Multimodal.decodeWavSamples(base.take(30)).isEmpty)
    assert(Multimodal.decodeWavSamples("RIFFjunk".getBytes).isEmpty)
    // the distributed stats operator agrees with the id formula
    val ids = Seq(0L, 7L, 123L)
    val stats = Multimodal.wavSampleStats(spark,
        Multimodal.packRealWavs(spark, ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    ids.zip(stats).foreach { case (id, r) =>
      val n = (id % 64 + 16).toInt
      val vals = (0 until n).map(i => (id * 37 + i * 101L) % 65536 - 32768)
      assert(r.getLong(1) == 8000 + (id % 5) * 8000)
      assert(r.getLong(2) == n.toLong)
      assert(r.getLong(3) == vals.map(math.abs).sum, s"sum_abs id $id")
      assert(r.getLong(4) == vals.map(v => v * v).sum, s"sum_sq id $id")
      assert(r.getLong(5) == vals.map(math.abs).max)
      assert(r.getLong(6) == vals.count(v => math.abs(v) >= 32000).toLong)
      assert(r.getLong(7) == vals.count(v => math.abs(v) < 1024).toLong)
    }
  }

  test("multimodal: REAL GIF LZW decode — round-trips through genuine compression; screens malformed") {
    // small image round-trip (stays at 9-bit codes)
    val (w1, h1) = (13, 9)
    def pix1(x: Int, y: Int): Int = (x * 11 + y * 17) % 256
    val g1 = Multimodal.decodeGif(Multimodal.buildGif(w1, h1, pix1))
    assert(g1.isDefined)
    val (dw1, dh1, px1) = g1.get
    assert(dw1 == w1 && dh1 == h1)
    for (y <- 0 until h1; x <- 0 until w1)
      assert((px1(y * w1 + x) & 0xff) == pix1(x, y), s"pixel ($x,$y)")
    // large low-entropy image: the dictionary grows through 10/11/12
    // bits and hits the table-full clear — the real LZW paths
    val (w2, h2) = (90, 80)
    def pix2(x: Int, y: Int): Int = (x / 3 + y / 5) % 256
    val g2 = Multimodal.decodeGif(Multimodal.buildGif(w2, h2, pix2))
    assert(g2.isDefined, "width-growth/clear round-trip failed")
    val (_, _, px2) = g2.get
    assert(px2.length == w2 * h2)
    for (y <- 0 until h2; x <- 0 until w2)
      assert((px2(y * w2 + x) & 0xff) == pix2(x, y),
        s"compressed pixel ($x,$y)")
    // high-entropy image exercises the literal-heavy path
    def pix3(x: Int, y: Int): Int = (x * 131 + y * 197 + x * y * 7) % 256
    val g3 = Multimodal.decodeGif(Multimodal.buildGif(40, 30, pix3))
    assert(g3.isDefined && (g3.get._3(17 * 40 + 23) & 0xff) == pix3(23, 17))
    // screens: junk, truncated sub-blocks, interlace flag
    assert(Multimodal.decodeGif("GIF89a".getBytes).isEmpty)
    val good = Multimodal.buildGif(8, 8, (x, y) => x + y)
    assert(Multimodal.decodeGif(good.dropRight(20)).isEmpty)
    val interlaced = good.clone()
    // image descriptor packed byte: 6 header + 7 lsd + 768 palette + 9
    interlaced(6 + 7 + 768 + 9) = 0x40.toByte
    assert(Multimodal.decodeGif(interlaced).isEmpty)
    // the distributed stats operator agrees with the id formula
    val ids = Seq(2L, 9L, 77L)
    val stats = Multimodal.gifPixelStats(spark,
        Multimodal.packRealGifs(spark, ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    ids.zip(stats).foreach { case (id, r) =>
      val w = (id % 14 + 4).toInt; val h = ((id * 5) % 10 + 4).toInt
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 29 + x * 11 + y * 17) % 256).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(4) == vals.map(_.toLong).sum, s"sum for id $id")
      assert(r.getLong(5) == vals.max.toLong)
      assert(r.getLong(6) == vals.count(_ > 127).toLong)
    }
  }

  test("ZOrder: interleave matches the bit-math reference; cluster yields disjoint z-ranges; box queries prune") {
    import graft.operators.ZOrder
    // reference Morton implementation, driver-side
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 0L),
      (0L, 255L), (4095L, 4095L), (1234L, 4321L), (65535L, 65535L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"interleave($x,$y)")
    }
    assert(morton(1, 0) == 1L && morton(0, 1) == 2L && morton(1, 1) == 3L)
    // cluster: partition z-ranges must be pairwise disjoint (that is
    // the whole point — each file covers a compact curve run)
    val data = (0 until 4000)
      .map(i => ((i * 37) % 4096L, (i * 91) % 4096L)).toDF("x", "y")
    val clustered = ZOrder.cluster(data, col("x"), col("y"), 8)
    val ranges = clustered
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
      .rdd.mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.min, zs.max))
      }.collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping partition z-ranges: $hi > $lo2")
      case _ => ()
    }
    assert(clustered.count() == 4000)
    // skipping audit: the z layout must read strictly fewer buckets
    // than the linear layout for a 2-D box on this spread-out data
    val audit = ZOrder.skippingAudit(data, col("x"), col("y"),
        zShift = 16, linShift = 4, 512, 1023, 512, 1023)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(audit("zorder") < audit("linear"),
      s"zorder ${audit("zorder")} must beat linear ${audit("linear")}")
  }

  test("Urls.canonicalizeUrl: variants of the same resource collapse; distinct resources don't") {
    import graft.operators.Urls
    def canon(u: String): String =
      Seq(u).toDF("u").select(Urls.canonicalizeUrl(col("u"))).collect()(0).getString(0)
    // the seven normalization steps, each pinned
    assert(canon("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/a/b?a=1&b=2")
    assert(canon("https://Example.com:443/") == "https://example.com/")
    assert(canon("https://example.com") == "https://example.com/")
    assert(canon("http://example.com/A/B") == "http://example.com/A/B",
      "path case must be preserved")
    assert(canon("http://example.com:8080/x") == "http://example.com:8080/x",
      "non-default ports must survive")
    assert(canon("https://example.com:80/x") == "https://example.com:80/x",
      ":80 is not the https default")
    assert(canon("http://example.com/x?ref=home") == "http://example.com/x")
    assert(canon("http://example.com/x?fbclid=abc&q=1")
      == "http://example.com/x?q=1")
    assert(canon("http://example.com/x?b=2&a=1")
      == canon("http://example.com/x?a=1&b=2"))
    // distinct resources stay distinct
    assert(canon("http://example.com/x?a=1") != canon("http://example.com/x?a=2"))
    assert(canon("http://example.com/x/y") != canon("http://example.com/x"))
  }

  test("Kmv value sketch: grown == one-shot; sub-k quantiles exact; rank algebra pinned") {
    import graft.operators.Kmv
    val k = 64
    val rows = (0 until 5000).map(i => (s"key-$i", (i * 37 % 1000).toLong))
    val df = rows.toDF("k", "v")
    // grown == one-shot, row-identically
    val one = Kmv.valueSketch(df, col("k"), col("v"), k)
    val grown = Kmv.mergeValues(Seq(
      Kmv.valueSketch(rows.take(2500).toDF("k", "v"), col("k"), col("v"), k),
      Kmv.valueSketch(rows.drop(2500).toDF("k", "v"), col("k"), col("v"), k)), k)
    assert(grown.orderBy("hv", "v").collect().toSeq ==
      one.orderBy("hv", "v").collect().toSeq)
    // below k the sample IS the relation: quantiles are exact
    val small = (0 until 40).map(i => (s"s-$i", i.toLong)).toDF("k", "v")
    val qs = Seq(0L, 250000L, 500000L, 1000000L)
    val est = Kmv.quantileEstimate(
        Kmv.valueSketch(small, col("k"), col("v"), k), qs)
      .orderBy("q_ppm").collect().map(r => r.getLong(1))
    // rank = (q·39) div 1e6 + 1 over v = 0..39 → values 0, 9, 19, 39
    assert(est.toSeq == Seq(0L, 9L, 19L, 39L))
    // the estimator lands near the true quantiles on the big relation
    // (uniform-ish values 0..999; k=64 keeps the error loose but bounded)
    val bigEst = Kmv.quantileEstimate(one, Seq(500000L)).collect()(0).getLong(1)
    assert(bigEst > 250 && bigEst < 750, s"median estimate $bigEst wild")
  }

  test("Kmv grouped value sketch: sub-k groups exact; one-group form matches the rank algebra") {
    import graft.operators.Kmv
    // two groups: one below k (sample == group, quantiles exact),
    // one above (uniform sample, estimate within a loose band)
    val rows = (0 until 30).map(i => ("small", s"s-$i", i.toLong)) ++
      (0 until 4000).map(i => ("big", s"b-$i", (i % 1000).toLong))
    val df = rows.toDF("g", "k", "v")
    val sk = Kmv.groupedValueSketch(df, col("g"), col("k"), col("v"), k = 64)
    val counts = sk.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("small") == 30 && counts("big") == 64)
    val est = Kmv.groupedQuantileEstimate(sk, Seq(0L, 500000L, 1000000L))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // small group below k: rank algebra over v = 0..29 → 0, 14, 29
    assert(est(("small", 0L)) == 0L)
    assert(est(("small", 500000L)) == 14L)
    assert(est(("small", 1000000L)) == 29L)
    // big group: median of a 64-row uniform sample of 0..999
    val bigMed = est(("big", 500000L))
    assert(bigMed > 250 && bigMed < 750, s"big-group median $bigMed wild")
  }

  test("Pq: lossless when the corpus IS the codewords; encode deterministic; recall audit exact") {
    import graft.operators.Pq
    // corpus with exactly ncode distinct vectors per seed class: every
    // codeword equals its class vector, so encoding is the class id in
    // every subspace, ADC distance to an identical query is 0, and the
    // PQ tier is LOSSLESS — recall must read exactly 1e6 ppm
    val m = 4; val ncode = 4; val dim = 8
    val rows = (0 until 64).map { id =>
      val cls = id % ncode
      // +0.5 keeps the ×1000 quantization away from float-rounding
      // boundaries (7/1000f can float-round below 0.007)
      (id.toLong, Array.tabulate(dim)(d => (cls * 10 + d + 0.5f) / 1000f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.trainSeeded(df, "vec_id", "embedding", m, ncode)
    assert(cb.m == m && cb.subDim == dim / m && cb.ncode == ncode)
    // codewords: class c, global dim g → c*10 + g (exact integer mean
    // of identical quantized vectors)
    for (s <- 0 until m; c <- 0 until ncode; d <- 0 until cb.subDim)
      assert(cb.words(s)(c)(d) == c * 10 + s * cb.subDim + d,
        s"codeword ($s,$c,$d)")
    val codes = df.select(col("vec_id"),
        Pq.encode(col("embedding"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, _) =>
      assert(codes(id) == Seq.fill(m)((id % ncode).toInt),
        s"codes for id $id")
    }
    val audit = Pq.recallAudit(df, "vec_id", "embedding",
      df.where(col("vec_id") < 8), "vec_id", "embedding", cb, k = 4)
      .collect()(0)
    assert(audit.getAs[Long]("n_queries") == 8L)
    assert(audit.getAs[Long]("recall_ppm") == 1000000L,
      s"lossless corpus must read full recall, got $audit")
    // ADC of an identical query to its own row is 0 and ranks first
    val top = Pq.topKAdc(df, "vec_id", "embedding",
        df.where(col("vec_id") === 5), "vec_id", "embedding", cb, k = 1)
      .collect()(0)
    assert(top.getAs[Long]("adc") == 0L)
    // exact re-ranking with rerank = |corpus| IS the exact ranking —
    // recall must read 1e6 regardless of how lossy the codes are
    val rr = Pq.rerankRecallAudit(df, "vec_id", "embedding",
      df.where(col("vec_id") < 8), "vec_id", "embedding", cb,
      k = 4, rerank = 64).collect()(0)
    assert(rr.getAs[Long]("recall_ppm") == 1000000L,
      s"full-corpus rerank must be exact, got $rr")
  }

  test("Pq IVF-PQ: zero residuals on a class-pure corpus; lossless recall; ADC 0 to own row") {
    import graft.operators.{IvfAnn, Pq}
    // corpus = 4 classes of identical vectors: coarse centroids equal
    // the class vectors, so every residual is 0, the residual
    // codebook is all zeros, and the tier is LOSSLESS end to end
    val dim = 8
    val rows = (0 until 64).map { id =>
      val cls = id % 4
      (id.toLong, Array.tabulate(dim)(d => (cls * 10 + d + 0.5f) / 1000f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = IvfAnn.seedCentroidsInt(df, "vec_id", "embedding", nlist = 4)
    val cb = Pq.trainSeededResiduals(df, "vec_id", "embedding", cents,
      m = 4, ncode = 4)
    assert(cb.words.flatten.flatten.forall(_ == 0L),
      "class-pure corpus must yield an all-zero residual codebook")
    val top = Pq.topKIvfPq(df, "vec_id", "embedding",
        df.where(col("vec_id") === 6), "vec_id", "embedding",
        cents, cb, k = 3, nprobe = 2)
      .orderBy("rk").collect()
    assert(top(0).getAs[Long]("adc") == 0L, "own-cell ADC must be 0")
    // the top-3 are the 3 smallest ids of class 6%4=2 (all distance 0)
    assert(top.map(_.getAs[Long]("id")).toSeq == Seq(2L, 6L, 10L))
    val audit = Pq.recallAuditIvfPq(df, "vec_id", "embedding",
      df.where(col("vec_id") < 8), "vec_id", "embedding",
      cents, cb, k = 4, nprobe = 2).collect()(0)
    assert(audit.getAs[Long]("recall_ppm") == 1000000L,
      s"lossless IVF-PQ must read full recall, got $audit")
  }

  test("Pq persisted IVF-PQ index: search equals in-plan ADC; probe cells reach the scan as a static partition filter") {
    import graft.operators.{IvfAnn, Pq}
    val corpus = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("q_id"), col("embedding").as("q_vec"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    Pq.buildIndexIvfPq(corpus, "vec_id", "embedding", s"$tmp/idx",
      nlist = 8, m = 4, ncode = 8)
    val viaIndex = Pq.searchIndexIvfPq(spark, s"$tmp/idx", queries,
      "q_id", "q_vec", k = 3, nprobe = 2)
    // the in-plan form under the SAME frozen models must agree row-for-row
    val cents = IvfAnn.loadCentroidsInt(spark, s"$tmp/idx")
    val cb = Pq.loadCodebook(spark, s"$tmp/idx")
    val direct = Pq.topKIvfPq(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", cents, cb, k = 3, nprobe = 2)
    assert(viaIndex.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaIndex).count() == 0)
    assert(direct.count() === 9L)
    // probe cells must prune the codes scan at listing time
    val scan = viaIndex.queryExecution.sparkPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val cellFilters = scan.partitionFilters.filter(
      _.references.exists(_.name == "__cell"))
    assert(cellFilters.exists {
      case _: org.apache.spark.sql.catalyst.expressions.IsNotNull => false
      case _ => true
    }, s"no pruning __cell partition filter in: ${scan.partitionFilters}")
    // the index stores codes, never vectors
    val cols = spark.read.parquet(s"$tmp/idx").columns.toSet
    assert(cols == Set("id", "codes", "__cell"),
      s"index must hold only id + codes + cell, got $cols")
  }

  test("Pq IVF-PQ lifecycle: build+append equals fresh build under frozen models; takedown re-admits") {
    import graft.operators.Pq
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val half = corpus.where(col("vec_id") < 100)
    val batch = corpus.where(col("vec_id") >= 100)
    val queries = corpus.where(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("q_id"), col("embedding").as("q_vec"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_lc").toString
    // grown == fresh, row-identically, under the SAME frozen models:
    // build on the half, append the rest; fresh index over the full
    // corpus with the half's models must be identical
    Pq.buildIndexIvfPq(half, "vec_id", "embedding", s"$tmp/grown",
      nlist = 8, m = 4, ncode = 8)
    Pq.appendToIndexIvfPq(spark, batch, "vec_id", "embedding", s"$tmp/grown")
    val grown = spark.read.parquet(s"$tmp/grown")
      .select("id", "codes", "__cell")
    val cents = graft.operators.IvfAnn.loadCentroidsInt(spark, s"$tmp/grown")
    val cb = Pq.loadCodebook(spark, s"$tmp/grown")
    val fresh = Pq.ivfPqCodes(corpus, "vec_id", "embedding", cents, cb)
      .groupBy("id", "cell")
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("s"), col("c")))),
        x => x.getField("c")).as("codes"))
      .select(col("id"), col("codes"), col("cell").as("__cell"))
    assert(grown.exceptAll(fresh).count() == 0 &&
      fresh.exceptAll(grown).count() == 0,
      "append under frozen models must equal the fresh encoding")
    // takedown: a deleted vector stops surfacing; searches still work
    val doomed = corpus.where(col("vec_id") === 7)
    val hitBefore = Pq.searchIndexIvfPq(spark, s"$tmp/grown", queries,
      "q_id", "q_vec", k = 200, nprobe = 8)
    assert(hitBefore.where(col("id") === 7).count() > 0,
      "vector 7 must be findable before the takedown")
    val report = Pq.deleteFromIndexIvfPq(spark, s"$tmp/grown", doomed,
      "vec_id", "embedding")
    assert(report.rowsDeleted == 1L, s"expected 1 deleted row, got $report")
    val hitAfter = Pq.searchIndexIvfPq(spark, s"$tmp/grown", queries,
      "q_id", "q_vec", k = 200, nprobe = 8)
    assert(hitAfter.where(col("id") === 7).count() == 0,
      "a removed vector must stop surfacing as a neighbor")
    assert(hitAfter.count() > 0)
  }

  test("compressionRatio: repetitive text compresses far below prose; empty/null screened; deterministic") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the " * 500),                            // heavy repetition
      (2L, new scala.util.Random(42).alphanumeric.take(500).mkString), // noisy
      (3L, "A normal English sentence with ordinary word variety here."),
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(rows(1)._3 < 100000L, s"repetition must compress hard: ${rows(1)}")
    assert(rows(2)._3 > 400000L, s"noise must resist compression: ${rows(2)}")
    assert(rows(2)._3 > rows(1)._3 * 4)
    assert(rows(4) == ((0L, 0L, -1L)) && rows(5) == ((0L, 0L, -1L)),
      "empty/null text must read null ratio")
    // deterministic across runs (fixed deflate level, JDK zlib)
    val again = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(again == rows)
  }

  test("multimodal: REAL BMP decode — round-trips padded bottom-up scanlines; screens unsupported") {
    // widths 4..15 exercise every row-padding remainder (w*3 mod 4)
    (4 to 15).foreach { w =>
      val h = 5
      def pix(x: Int, y: Int): Int = (x * 13 + y * 19 + w) % 256
      val decoded = Multimodal.decodeBmp(Multimodal.buildBmp(w, h, pix))
      assert(decoded.isDefined, s"w=$w failed to decode")
      val (dw, dh, gray) = decoded.get
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((gray(y * w + x) & 0xff) == pix(x, y),
          s"w=$w pixel ($x,$y) — padding or row-order defect")
    }
    // screens: junk, truncated data, non-24bpp
    assert(Multimodal.decodeBmp("BMjunk".getBytes).isEmpty)
    val good = Multimodal.buildBmp(8, 8, (x, y) => x + y)
    assert(Multimodal.decodeBmp(good.dropRight(10)).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).isEmpty)
    // resizeImage routes BMP through the unified decode (BMP in,
    // PNG out — the transcode-on-resize shape)
    val ids = Seq(4L, 11L)
    val resized = Multimodal.resizeImage(spark,
        Multimodal.packRealBmps(spark, ids.toDF("doc_id"), "doc_id"),
        w = 6, h = 5)
      .orderBy("media_id").collect()
    ids.zip(resized).foreach { case (id, r) =>
      val sw = (id % 12 + 4).toInt; val sh = ((id * 3) % 9 + 4).toInt
      val (dw, dh, bpp, pix) =
        Multimodal.decodePng(r.getAs[Array[Byte]]("media")).get
      assert(dw == 6 && dh == 5 && bpp == 1)
      for (y <- 0 until 5; x <- 0 until 6) {
        val expect = ((id * 23 + (x * sw / 6) * 13 + (y * sh / 5) * 19) % 256).toInt
        assert((pix(y * 6 + x) & 0xff) == expect, s"id $id resized ($x,$y)")
      }
    }
    // the distributed stats agree with the id formula
    val stats = Multimodal.bmpPixelStats(spark,
        Multimodal.packRealBmps(spark, Seq(5L, 42L).toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    Seq(5L, 42L).zip(stats).foreach { case (id, r) =>
      val w = (id % 12 + 4).toInt; val h = ((id * 3) % 9 + 4).toInt
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 23 + x * 13 + y * 19) % 256).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(4) == vals.map(_.toLong).sum, s"sum for id $id")
      assert(r.getLong(6) == vals.count(_ > 127).toLong)
    }
  }

  test("multimodal: wavInfo parses a canonical RIFF header; non-wav null") {
    val packed = Multimodal.packFakeWavs(
      Seq(0L, 1L, 7L, 999L).toDF("doc_id"), "doc_id")
    val rows = packed.select(col("media_id"),
        Multimodal.wavInfo(col("media")).as("w")).orderBy("media_id").collect()
    rows.foreach { r =>
      val id = r.getLong(0); val s = r.getStruct(1)
      val rate = 8000L + (id % 5) * 8000L
      val ch = id % 2 + 1
      assert(s.getLong(0) == ch && s.getLong(1) == rate,
        s"channels/rate for id $id: $s")
      assert(s.getLong(2) ==
        ((id % 1000) * 2 + 2) * 1000 / (rate * ch * 2),
        s"duration for id $id: $s")
    }
    val nonWav = Seq((1L, "FFD8FFE0"))
      .toDF("id", "h").select(Multimodal.wavInfo(unhex(col("h"))).as("w"))
    assert(nonWav.head.isNullAt(0))
    // a sniffed-WAV header declaring byte_rate = 0 (malformed) reads a
    // null duration — not the floor(Infinity) → Long.MaxValue a
    // non-ANSI double divide would produce; channels/rate still parse
    val zeroRate = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "401F0000" + "00000000" + "0400" +
      "1000" + "64617461" + "E8030000"
    val zr = Seq((1L, zeroRate)).toDF("id", "h")
      .select(Multimodal.wavInfo(unhex(col("h"))).as("w")).head.getStruct(0)
    assert(zr.getLong(0) === 2L && zr.getLong(1) === 8000L)
    assert(zr.isNullAt(2), s"duration must be null on byte_rate=0: $zr")
  }

  test("multimodal: mp4Brand reads the ftyp brand; non-mp4 null") {
    val rows = Multimodal.packFakeMp4s(Seq(0L, 1L).toDF("doc_id"), "doc_id")
      .select(Multimodal.mp4Brand(col("media")).as("b")).orderBy("b").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("isom", "mp42"))
    val nonMp4 = Seq((1L, "FFD8FFE0AABBCCDDEEFF0011"))
      .toDF("id", "h").select(Multimodal.mp4Brand(unhex(col("h"))).as("b"))
    assert(nonMp4.head.isNullAt(0))
  }

  test("splitLeakAudit: counts straddling pairs exactly; leak-safe split reads zero") {
    import graft.operators.Sampling
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "val"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("id_a", "id_b")
    val r = Sampling.splitLeakAudit(splits, pairs).head
    // (1,2) train/test and (2,4) test/val straddle; (1,3) stays
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      (3L, 2L, 2L * 1000000L / 3L))
    val safe = splits.withColumn("split",
      org.apache.spark.sql.functions.lit("train"))
    assert(Sampling.splitLeakAudit(safe, pairs).head.getLong(1) === 0L)
    // empty pair relation: (0, 0, 0) — an explicit zero-leak reading,
    // never a null ppm an operator would have to interpret
    val none = Sampling.splitLeakAudit(splits,
      pairs.where(org.apache.spark.sql.functions.lit(false))).head
    assert((none.getLong(0), none.getLong(1), none.getLong(2)) ===
      (0L, 0L, 0L))
  }

  test("CountMin: est >= exact always; merge == one-shot; unseen term reads 0") {
    import graft.operators.CountMin
    // width 4 FORCES collisions over a 12-term vocabulary
    val terms = (1 to 12).flatMap(i => Seq.fill(i)(s"term$i"))
      .toDF("word")
    val sk = CountMin.build(terms, col("word"), depth = 3, width = 4,
      salt = "t")
    val exact = terms.groupBy("word").agg(count(lit(1)).as("c"))
    val est = CountMin.estimate(sk, exact, col("word"), depth = 3,
      width = 4, salt = "t")
      .join(exact, col("term") === col("word"))
    val rows = est.select("term", "cms_est", "c").collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS must never underestimate: ${r.getString(0)} " +
          s"est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
    // collisions actually happened at width 4 (the bound is vacuous
    // otherwise)
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)))
    // mergeable: two disjoint halves cell-sum to the one-shot sketch
    val a = CountMin.build(terms.where(col("word") <= "term5"),
      col("word"), 3, 4, "t")
    val b = CountMin.build(terms.where(col("word") > "term5"),
      col("word"), 3, 4, "t")
    val merged = CountMin.merge(Seq(a, b)).orderBy("r", "bucket")
      .collect().map(_.toSeq).toSeq
    val oneShot = sk.orderBy("r", "bucket").collect().map(_.toSeq).toSeq
    assert(merged === oneShot)
    // a term nothing ever hashed near CAN read 0 through the left
    // join; at minimum an unseen term never exceeds the global min cell
    val unseen = CountMin.estimate(sk, Seq("zzz-never").toDF("w"),
      col("w"), 3, 4, "t").head.getLong(1)
    assert(unseen >= 0L)
  }

  test("multimodal: byte stats are exact on known payloads") {
    import graft.functions.ByteStats
    val df = Seq((1L, Array[Byte](0, 0, 1, 2))).toDF("id", "b")
      .select(ByteStats.column(col("b")).as("st")).select("st.*")
    val r = df.as[(Int, Int, Int, Long)].head()
    // n=4; bytes {0,0,1,2}: distinct 3, max_freq 2,
    // checksum = 1*1 + 1*2 + 2*3 + 3*4 = 21
    assert(r == ((4, 3, 2, 21L)))
  }

  test("multimodal: resize stub emits w*h payloads with updated meta") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(20)
    val packed = Multimodal.packFake(docs, "doc_id", "text")
    val resized = Multimodal.resizeStub(spark, packed, w = 16, h = 8)
    val rows = resized.select("media_id", "media", "meta.width", "meta.height").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Array[Byte]](1).length == 128))
    assert(rows.forall(r => r.getInt(2) == 16 && r.getInt(3) == 8))
  }

  test("dupClusters converges on a 64-node chain within default iterations") {
    // path graph 0-1-2-...-63: diameter 63 — plain one-hop propagation
    // would need 63 rounds; pointer jumping must finish in <= 15
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.dupClusters(chain)
    val distinctLabels = labels.select("label").distinct().collect().map(_.getLong(0))
    assert(distinctLabels.toSeq == Seq(0L))
    assert(labels.count() == 64)
  }

  test("multiProbeTopK recall >= single-probe recall vs brute force") {
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 300).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val queries = corpus.where(col("id") < 10)
      .select(col("id").as("q_id"), col("v").as("q_vec"))
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(
      corpus, queries, "id", "v", "q_id", "q_vec", k = 3))
    val single = hits(Similarity.bucketedTopK(
      corpus, queries, "id", "v", "q_id", "q_vec", dim = 16, k = 3, planes = 4))
    val multi = hits(Similarity.multiProbeTopK(
      corpus, queries, "id", "v", "q_id", "q_vec", dim = 16, k = 3, planes = 4))
    assert((multi & exact).size >= (single & exact).size)
    assert((multi & exact).nonEmpty)
  }

  test("ngramContamination flags shared 5-grams, skips disjoint docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven"),
      (3L, "totally different content with no overlap at all here")).toDF("id", "text")
    val test = Seq(
      (100L, "prefix words then alpha beta gamma delta epsilon and more"),
      (101L, "nothing shared with anything whatsoever today")).toDF("id", "text")
    val hits = Dedup.ngramContamination(test, "id", train, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 100 shares exactly the 5-gram "alpha beta gamma delta epsilon"
    assert(hits.toSeq == Seq((100L, 1L, 1L)))
  }

  test("multimodal: pack/decode-stub/frame-sample plumbing") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val packed = Multimodal.packFake(docs, "doc_id", "text")
    assert(packed.schema("media").dataType.typeName == "binary")
    assert(packed.schema("meta").dataType.typeName == "struct")
    val feats = Multimodal.decodeFeaturesStub(spark, packed, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    // deterministic: run twice, same features
    val again = Multimodal.decodeFeaturesStub(spark, packed, batchSize = 7).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap)
    val frames = Multimodal.frameSample(packed, 16, 2)
    assert(frames.count() > 0)
    assert(frames.schema("frame").dataType.typeName == "binary")
  }

  test("redactPii: each category redacts to its token, counts match") {
    val df = Seq((1L,
      "mail a@b.com or see https://x.io/p?a=1 from 10.0.0.7 call 555-0199 done"))
      .toDF("id", "text")
    val out = df.select(
      (col("id") +:
        TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) } :+
        TextAnalysis.redactPii(col("text")).as("red")): _*).head()
    assert(out.getInt(1) == 1 && out.getInt(2) == 1 &&
      out.getInt(3) == 1 && out.getInt(4) == 1)
    assert(out.getString(5) ==
      "mail <EMAIL> or see <URL> from <IP> call <PHONE> done")
    // order matters: an email inside a URL path dies with the URL
    val urlMail = df.select(TextAnalysis.redactPii(
      lit("go http://h.io/x@y.com now")).as("r")).as[String].head()
    assert(urlMail == "go <URL> now")
    // clean text untouched
    val clean = df.select(TextAnalysis.redactPii(
      lit("plain words only here")).as("r")).as[String].head()
    assert(clean == "plain words only here")
  }

  test("tfIdfTopTerms: rare term outranks common term; k bounds output") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common other")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: "rare" (df=1) must beat "common" (tf=2 but df=3):
    // score(rare) = 1*3/1 = 3 > score(common) = 2*3/3 = 2
    val d1 = top.filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getString(2)))
    assert(d1.toSeq == Seq((1, "rare"), (2, "common")))
    assert(top.groupBy(_.getLong(0)).forall(_._2.length <= 2))
  }

  test("containmentPairs: subset doc flagged, oriented small -> large") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "unrelated words entirely different")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.9, blockOn = Seq.empty)
      .select("contained_id", "container_id", "n_shared", "n_contained")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(pairs.toSeq == Seq((1L, 2L, 3, 3)))
    // symmetric Jaccard would miss it: 3/6 = 0.5
  }

  test("semanticDupPairs: within-cell near-identical vectors pair up") {
    // two clusters of 64-dim vectors; ids 1,2 nearly parallel, 10 far
    def vec(base: Double, jitter: Double) =
      Array.tabulate(64)(i => (math.sin(i * base) + (if (i == 0) jitter else 0)).toFloat).toSeq
    val emb = Seq(
      (1L, vec(0.1, 0.0)), (2L, vec(0.1, 0.001)), (10L, vec(0.9, 0.0)))
      .toDF("vec_id", "embedding")
    val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding", nlist = 2)
    val pairs = Dedup.semanticDupPairs(emb, "vec_id", "embedding", cents,
      threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // degenerate-cell cap: cap 1 forbids any pairing
    val none = Dedup.semanticDupPairs(emb, "vec_id", "embedding", cents,
      threshold = 0.99, maxCellSize = 1).count()
    assert(none == 0)
  }

  test("knnClassify: majority label wins, ties to smallest label") {
    // corpus: 3 vectors near the query with labels 7,7,3 -> predict 7
    def vec(shift: Double) =
      Array.tabulate(8)(i => (math.cos(i * 0.2) + shift).toFloat).toSeq
    val corpus = Seq(
      (1L, vec(0.001), 7), (2L, vec(0.002), 7), (3L, vec(0.003), 3),
      (4L, Array.tabulate(8)(i => math.sin(i * 1.3).toFloat).toSeq, 1))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, vec(0.0))).toDF("q_id", "q_vec")
    val out = Similarity.knnClassify(corpus, queries,
      "vec_id", "embedding", "label", "q_id", "q_vec", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((100L, 7, 2L)))
  }

  test("chunkDocs: non-overlapping chunks reassemble the token stream") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val chunks = TextAnalysis.chunkDocs(docs, "doc_id", "text",
      chunkTokens = 30, stride = 30)
    // stride == chunkTokens: concatenating chunks in order rebuilds
    // the full normalized token stream of each doc
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        s => s.getField("chunk_text"))).as("joined"))
    val direct = docs.select(col("doc_id"),
      concat_ws(" ", TextAnalysis.tokens(col("text"))).as("joined"))
      .where(length(col("joined")) > 0)
    assert(rebuilt.exceptAll(direct).count() == 0 &&
      direct.exceptAll(rebuilt).count() == 0)
    // overlap form: every chunk's size is exactly
    // min(chunkTokens, totalTokens - stride * chunk_idx)
    val over = TextAnalysis.chunkDocs(docs, "doc_id", "text", 50, 40)
    val totals = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("__total"))
    val bad = over.join(totals, "doc_id")
      .where(col("n_tokens") =!=
        least(lit(50), col("__total") - lit(40) * col("chunk_idx")))
      .count()
    assert(bad == 0)
  }

  test("quotaCapPerGroup: agg form matches the window form; id form keeps smallest") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val agg = Sampling.quotaCapPerGroup(docs, "source", "doc_id", k = 7)
      .select("doc_id", "source")
    // the window reconstruction of the same 52-bit draw + id order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long").asc, col("doc_id").asc)
    val win = docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 7).select("doc_id", "source")
    assert(agg.exceptAll(win).count() == 0 && win.exceptAll(agg).count() == 0)
    // every group capped, none emptied
    val sizes = agg.groupBy("source").count().select("count")
      .as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(n => n >= 1 && n <= 7))
    // byHash=false keeps the k SMALLEST ids per group
    val first = Sampling.quotaCapPerGroup(docs, "source", "doc_id",
      k = 3, byHash = false)
    val expect = docs.withColumn("__rn", org.apache.spark.sql.functions
        .row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("doc_id").asc)))
      .where(col("__rn") <= 3).drop("__rn")
    assert(first.select("doc_id").exceptAll(expect.select("doc_id")).count() == 0 &&
      expect.select("doc_id").exceptAll(first.select("doc_id")).count() == 0)
  }

  test("knnClassifyFromNeighbors: the vote composes with the IVF tier") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding", nlist = 4)
    // nprobe = nlist probes every cell, so the IVF candidate set is
    // the full corpus and the composed vote must match the exact tier
    // row-for-row — this pins the neighbors-frame contract the vote
    // depends on (query_id/neighbor_id naming, k-bounded rows)
    val viaIvf = Similarity.knnClassifyFromNeighbors(
      IvfAnn.topKInt(emb, queries, "vec_id", "embedding",
        "q_id", "q_vec", cents, k = 5, nprobe = 4),
      emb, "vec_id", "label")
    val viaBrute = Similarity.knnClassify(emb, queries,
      "vec_id", "embedding", "label", "q_id", "q_vec", k = 5)
    assert(viaIvf.exceptAll(viaBrute).count() == 0 &&
      viaBrute.exceptAll(viaIvf).count() == 0 && viaIvf.count() == 20)
  }

  test("boilerplateRate: hashed-gram rate matches the string-gram reconstruction") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(200)
    val out = TextAnalysis.boilerplateRate(docs, "doc_id", "text", n = 2, minDf = 3)
    // string-space replay of the same distinct-bigram sets (the md5-60
    // bijection the operator relies on), including the short-doc
    // padded gram — proves the hashed fast path computes string-space
    // document frequencies
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
    val grams = toks.select(col("doc_id"), explode(array_distinct(
        when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => concat_ws(",", element_at(col("t"), i + 1),
              element_at(col("t"), i + 2))))
          .otherwise(array(concat(element_at(col("t"), 1), lit(",-1"))))))
      .as("gram"))
    val fq = grams.groupBy("gram").count().where(col("count") >= 3)
      .select(col("gram"), lit(1).as("__hit"))
    val expect = grams.join(fq, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count_if(col("__hit").isNotNull).as("n_frequent"))
      .withColumn("boilerplate_rate",
        col("n_frequent").cast("double") / col("n_grams").cast("double"))
    assert(out.exceptAll(expect).count() == 0 &&
      expect.exceptAll(out).count() == 0)
    // the signal actually fires on this corpus (some gram repeats)
    assert(out.where(col("n_frequent") > 0).count() > 0)
    // every doc with tokens is present, rates in [0,1]
    assert(out.count() == toks.count())
    assert(out.where(col("boilerplate_rate") < 0 ||
      col("boilerplate_rate") > 1).count() == 0)
  }

  test("dedupChunksKeepFirst: agg pick matches the window form; survivors unique") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.dedupChunksKeepFirst(docs, "doc_id", "text", chunkTokens = 3)
    // window reconstruction of the same keep-first rule
    val chunks = TextAnalysis.chunkDocs(docs, "doc_id", "text", 3, 3)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk_text")
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
    val expect = chunks.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text"))).as("text_deduped"))
    assert(out.exceptAll(expect).count() == 0 &&
      expect.exceptAll(out).count() == 0)
    // keep-first keeps EXACTLY one occurrence per distinct chunk text:
    // total kept chunks == distinct input chunk texts (and dedup
    // actually fired: strictly fewer than the input chunk count)
    val keptChunks = out.agg(sum("n_chunks_kept")).as[Long].head()
    val distinctChunks = chunks.select("chunk_text").distinct().count()
    val inputChunks = chunks.count()
    assert(keptChunks == distinctChunks,
      s"kept $keptChunks != $distinctChunks distinct chunks")
    assert(keptChunks < inputChunks, "no duplicate chunk existed to drop")
    val resurvived = Dedup.dedupChunksKeepFirst(
      out.select(col("doc_id"), col("text_deduped").as("text")),
      "doc_id", "text", chunkTokens = 3)
    // note: re-chunking survivors can re-pair tokens across removed
    // chunk boundaries, so only assert it never GROWS
    assert(resurvived.agg(sum("n_chunks_kept")).as[Long].head() <=
      out.agg(sum("n_chunks_kept")).as[Long].head())
  }

  test("quantileBuckets: monotone bands, near-equal populations, sketch == exact here") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Sampling.quantileBuckets(docs, "n_chars", buckets = 4, exact = true)
    // bucket is monotone in the value: max of band b <= min of band b+1
    val bands = out.groupBy("bucket")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("bucket")
      .as[(Int, Long, Long, Long)].collect()
    assert(bands.map(_._1).toSeq == Seq(1, 2, 3, 4))
    bands.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"bands overlap: $a vs $b")
    }
    // near-equal populations (ties can skew; 500 docs, wide value range)
    val total = bands.map(_._4).sum
    bands.foreach { b =>
      assert(b._4 > total / 8 && b._4 < total * 3 / 8,
        s"band ${b._1} holds ${b._4} of $total")
    }
    // the approx_percentile sketch path (the 100 TB default) assigns
    // identical buckets at this scale (few hundred distinct values)
    val approx = Sampling.quantileBuckets(docs, "n_chars", buckets = 4)
    assert(out.exceptAll(approx).count() == 0 &&
      approx.exceptAll(out).count() == 0)
  }

  test("deterministicSampleByRate: clamped, nested across rates, rate-accurate") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val total = docs.count()
    // clamping: rate > 1 keeps everything, rate < 0 keeps nothing
    assert(Sampling.deterministicSampleByRate(docs, "doc_id", lit(1.5))
      .count() == total)
    assert(Sampling.deterministicSampleByRate(docs, "doc_id", lit(-0.5))
      .count() == 0)
    // same salt -> survivor sets NESTED across rates
    val lo = Sampling.deterministicSampleByRate(docs, "doc_id", lit(0.3))
      .select("doc_id")
    val hi = Sampling.deterministicSampleByRate(docs, "doc_id", lit(0.7))
      .select("doc_id")
    assert(lo.exceptAll(hi).count() == 0)
    // the md5 draw is roughly uniform: 30% +- 15pp on 500 docs
    val n = lo.count().toDouble
    assert(n > total * 0.15 && n < total * 0.45,
      s"rate-0.3 sample kept $n of $total")
    // different salts decorrelate (the sets differ)
    val other = Sampling.deterministicSampleByRate(docs, "doc_id", lit(0.3),
      salt = "epoch2").select("doc_id")
    assert(lo.exceptAll(other).count() > 0)
  }

  test("crossSourceDupMatrix: unordered source cells, tier-agnostic pair input") {
    val docs = Seq((1L, "web"), (2L, "books"), (3L, "web"), (4L, "web"))
      .toDF("id", "src")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val m = Dedup.crossSourceDupMatrix(pairs, docs, "id", "src")
      .orderBy("src_a", "src_b")
      .as[(String, String, Long)].collect().toSeq
    // (1,2) and (2,3) both fold into the unordered (books, web) cell
    assert(m == Seq(("books", "web", 2L), ("web", "web", 2L)), m.toString)
  }

  // ---------------------------------------------------- snapshot diff
  test("Snapshot.diff reports exactly the churn: added, removed, changed") {
    val oldSnap = Seq((1L, "dA"), (2L, "dB"), (3L, "dC"))
      .toDF("id", "digest")
    val newSnap = Seq((1L, "dA"), (2L, "dB2"), (4L, "dD"))
      .toDF("id", "digest")
    val diff = Snapshot.diff(oldSnap, newSnap, "id", "digest")
      .orderBy("id")
      .select("id", "status", "old_digest", "new_digest")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(diff == Seq(
      (2L, "changed", Some("dB"), Some("dB2")),
      (3L, "removed", Some("dC"), None),
      (4L, "added", None, Some("dD"))),
      s"unchanged id 1 must be absent and the churn exact, got $diff")
    // identical snapshots diff to nothing
    assert(Snapshot.diff(oldSnap, oldSnap, "id", "digest").count() == 0)
  }

  // ---------------------------------------------- DSIR data selection
  private val dsirCorpus = Seq(
    (1L, "the cat sat on the mat and the dog slept", "en"),
    (2L, "the quick brown fox jumps over the lazy dog", "en"),
    (3L, "the rain in spain falls mainly on the plain", "en"),
    (4L, "der hund schlief auf der matte im haus", "de"),
    (5L, "le chat dort sur le tapis dans la maison", "fr"),
    (6L, "el perro duerme sobre la alfombra en casa", "es"),
    (7L, "", "en"))

  test("lmScores: templated text reads a lower mean nll than rare text; " +
      "empty doc keeps zero totals and a null mean") {
    val rows = (1L to 20L).map(i => (i, "the cat sat on the mat")) ++
      Seq((21L, "zq xv qj wk"), (22L, ""))
    val df = rows.toDF("doc_id", "text")
    val st = Sampling.dsirState(df, "text", buckets = 256, salt = "t")
    val out = Sampling.lmScores(df, Sampling.lmModelFromState(st, 256),
        "doc_id", "text", buckets = 256, salt = "t")
      .orderBy("doc_id").collect()
    def m(i: Int) = out(i).getAs[Long]("mean_nll_unats")
    assert(m(0) < m(20),
      s"the 20x-repeated doc must be more predictable: ${m(0)} vs ${m(20)}")
    val empty = out(21)
    assert(empty.getAs[Long]("nll_unats") == 0L &&
      empty.getAs[Long]("n_feats") == 0L &&
      empty.isNullAt(empty.fieldIndex("mean_nll_unats")))
    // exact integers: partition layout cannot move a single micro-nat
    val re = Sampling.lmScores(df.repartition(7),
        Sampling.lmModelFromState(st, 256), "doc_id", "text", 256, "t")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("nll_unats")).toSeq ===
      re.map(_.getAs[Long]("nll_unats")).toSeq)
  }

  test("dsirScores: target-like docs outscore the rest; exact integer " +
      "scores are partition-invariant; empty text scores 0") {
    val raw = dsirCorpus.toDF("doc_id", "text", "lang")
    val target = raw.where(col("lang") === "en" && length(col("text")) > 0)
    val scored = Sampling.dsirScores(raw, target, "doc_id", "text",
      buckets = 256, salt = "t")
    val byId = scored.select("doc_id", "score_unats", "n_feats")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // every non-empty en doc must outscore every non-en doc: the en
    // slice IS the target model, so its features carry positive
    // log-ratios while de/fr/es features appear only on the raw side
    val enMin = Seq(1L, 2L, 3L).map(byId(_)._1).min
    val otherMax = Seq(4L, 5L, 6L).map(byId(_)._1).max
    assert(enMin > otherMax,
      s"target-slice docs must outscore the rest: en min $enMin <= other max $otherMax")
    // empty text: no features, score exactly 0
    assert(byId(7L) == ((0L, 0L)))
    // unigrams + bigrams with multiplicity: "the cat sat on the mat
    // and the dog slept" = 10 tokens + 9 bigrams
    assert(byId(1L)._2 == 19L)
    // exact-integer determinism: any partitioning sums the same Longs
    val re = Sampling.dsirScores(raw.repartition(7), target, "doc_id",
      "text", buckets = 256, salt = "t")
      .select("doc_id", "score_unats", "n_feats")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(re == byId, "scores must be invariant to input partitioning")
  }

  test("dsirSelect: exactly k rows, a pure function of the data, keys ranked") {
    val raw = dsirCorpus.toDF("doc_id", "text", "lang")
    val target = raw.where(col("lang") === "en" && length(col("text")) > 0)
    val sel = Sampling.dsirSelect(raw, target, "doc_id", "text",
      k = 4, buckets = 256, salt = "t")
      .select("doc_id", "sel_key").as[(Long, Long)].collect().toSeq
    assert(sel.size == 4)
    assert(sel.map(_._2) == sel.map(_._2).sorted.reverse,
      "selection must come back largest sel_key first")
    val again = Sampling.dsirSelect(raw.repartition(5), target, "doc_id",
      "text", k = 4, buckets = 256, salt = "t")
      .select("doc_id", "sel_key").as[(Long, Long)].collect().toSeq
    assert(again == sel, "selection must be replayable bit-for-bit")
    // k >= corpus: everything comes back
    assert(Sampling.dsirSelect(raw, target, "doc_id", "text",
      k = 100, buckets = 256, salt = "t").count() == 7)
  }

  test("dsirState merges associatively: grown == one-shot bit-identically; " +
      "scoring against the grown model == dsirScores") {
    val raw = dsirCorpus.toDF("doc_id", "text", "lang")
    val target = raw.where(col("lang") === "en" && length(col("text")) > 0)
    val a = raw.where(col("doc_id") <= 3)
    val b = raw.where(col("doc_id") > 3)
    def st(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirState(df, "text", buckets = 256, salt = "t")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long)].collect().toMap
    val oneShot = toMap(st(raw))
    assert(toMap(Sampling.mergeDsirStates(Seq(st(a), st(b)))) == oneShot)
    // associativity over three batches
    val (b1, b2, b3) = (raw.where(col("doc_id") <= 2),
      raw.where(col("doc_id") > 2 && col("doc_id") <= 5),
      raw.where(col("doc_id") > 5))
    val leftFold = Sampling.mergeDsirStates(
      Seq(Sampling.mergeDsirStates(Seq(st(b1), st(b2))), st(b3)))
    val rightFold = Sampling.mergeDsirStates(
      Seq(st(b1), Sampling.mergeDsirStates(Seq(st(b2), st(b3)))))
    assert(toMap(leftFold) == oneShot && toMap(rightFold) == oneShot)
    // the factored path reproduces dsirScores exactly
    val model = Sampling.dsirModelFromStates(
      Sampling.mergeDsirStates(Seq(st(a), st(b))), st(target), 256)
    assert(model.count() == 256, "model must cover the full bucket domain")
    val viaModel = Sampling.dsirScoresAgainstModel(raw, model, "doc_id",
      "text", buckets = 256, salt = "t")
      .select("doc_id", "score_unats").as[(Long, Long)].collect().toMap
    val direct = Sampling.dsirScores(raw, target, "doc_id", "text",
      buckets = 256, salt = "t")
      .select("doc_id", "score_unats").as[(Long, Long)].collect().toMap
    assert(viaModel == direct)
  }

  test("dsirScoresAgainstModel: a frozen model scores UNSEEN features via " +
      "the full-domain default, never drops them") {
    val raw = dsirCorpus.toDF("doc_id", "text", "lang")
    val target = raw.where(col("lang") === "en" && length(col("text")) > 0)
    val rawState = Sampling.dsirState(raw, "text", buckets = 256, salt = "t")
    val tgtState = Sampling.dsirState(target, "text", buckets = 256, salt = "t")
    val model = Sampling.dsirModelFromStates(rawState, tgtState, 256)
    // "zzzq zzzq" -> 2 unigram occurrences + 1 bigram, none in either
    // corpus. A present-buckets-only model would DROP them (inner
    // join misses); the full-domain model scores them — n_feats
    // counts all 3 and the score is exactly the model's rows at the
    // features' buckets (replayed here with the same public md5
    // bucketing the oracles use)
    val scored = Sampling.dsirScoresAgainstModel(
      Seq((99L, "zzzq zzzq")).toDF("doc_id", "text"), model,
      "doc_id", "text", buckets = 256, salt = "t")
      .select("score_unats", "n_feats").as[(Long, Long)].head()
    val expected = Seq("zzzq", "zzzq", "zzzq zzzq").toDF("f")
      .select((conv(substring(
          md5(concat_ws(":", lit("t"), col("f"))), 1, 15), 16, 10)
        .cast("long") % 256).cast("int").as("bucket"))
      .join(model, Seq("bucket"))
      .agg(sum("lscore_unats")).as[Long].head()
    assert(scored == ((expected, 3L)),
      s"unseen features must score via the full-domain model, got $scored vs ${(expected, 3L)}")
  }

  test("dsirDivergence: KL(A||A) is exactly 0; distinct content reads positive; one row") {
    val raw = dsirCorpus.toDF("doc_id", "text", "lang")
    val en = Sampling.dsirState(raw.where(col("lang") === "en"), "text",
      buckets = 256, salt = "t")
    val de = Sampling.dsirState(raw.where(col("lang") === "de"), "text",
      buckets = 256, salt = "t")
    val self = Sampling.dsirDivergence(en, en, 256).collect()
    assert(self.length == 1)
    assert(self.head.getAs[Long]("kl_num_unats") == 0L &&
      self.head.getAs[Long]("kl_micronats") == 0L,
      s"KL(A||A) must read 0: ${self.head}")
    val cross = Sampling.dsirDivergence(en, de, 256).collect().head
    assert(cross.getAs[Long]("kl_micronats") > 0L,
      s"disjoint-content corpora must diverge: $cross")
    assert(cross.getAs[Long]("total_a") ==
      self.head.getAs[Long]("total_a"))
  }

  test("stripRepeatedLines: first occurrence survives in order, blanks always pass, null propagates") {
    val df = Seq(
      (1L, "nav menu\nreal content\n\nnav menu\nmore text\n\nreal content"),
      (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.stripRepeatedLines(df, "doc_id", "text")
      .select("doc_id", "text", "n_lines", "n_kept")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(1) == "nav menu\nreal content\n\nmore text\n",
      s"dup lines drop, blanks survive, order holds: '${r(1L).getString(1)}'")
    assert(r(1L).getLong(2) == 7L && r(1L).getLong(3) == 5L)
    assert(r(2L).isNullAt(1) && r(2L).getLong(2) == 0L &&
      r(2L).getLong(3) == 0L, "null text must propagate null")
    assert(r(3L).getString(1) == "" && r(3L).getLong(2) == 1L)
  }

  // ------------------------------------------------ Gopher rule bundle
  test("gopherRules: each gate flips on exactly its own rule; null text never passes") {
    val good = Array.fill(6)(
      "the quick brown fox jumps and it was here for").mkString(" ")
    val docs = Seq(
      (1L, good),                                    // all gates pass
      (2L, "short text only"),                       // too few words
      (3L, good + " " + "#" * 20),                   // symbol-heavy
      (4L, (1 to 10).map(i => s"- item $i").mkString("\n")), // all bullets
      (5L, "12345 67890 11111 22222 33333"),         // digit words
      (7L, "line one...\nline two...\nline three\nline four"), // ellipses
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("pass"), s"good doc must pass: ${r(1L)}")
    assert(!r(2L).getAs[Boolean]("word_count_ok") &&
      r(2L).getAs[Boolean]("symbol_ok"))
    assert(!r(3L).getAs[Boolean]("symbol_ok") &&
      r(3L).getAs[Boolean]("word_count_ok"),
      s"20 hashes over 60 words must trip only the symbol gate: ${r(3L)}")
    assert(!r(4L).getAs[Boolean]("bullet_ok"))
    assert(!r(5L).getAs[Boolean]("alpha_ok"))
    assert(!r(7L).getAs[Boolean]("ellipsis_ok"),
      s"2 ellipsis lines of 4 must trip the 30% gate: ${r(7L)}")
    assert(r(6L).getLong(1) == 0L && !r(6L).getAs[Boolean]("pass"),
      s"null text must count as empty and never pass: ${r(6L)}")
  }

  test("nbClassify: planted disjoint vocab separates perfectly; grown " +
      "state == one-shot; feature-less docs fall back to the prior argmax") {
    // two classes with DISJOINT vocabularies — the x154 confusion
    // audit on the synthetic corpus reads ~base-rate (no signal
    // there); this pins that the classifier DOES separate when
    // signal exists
    val seed = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta alpha beta", "good")
      else (i.toLong, "zork quux blarg wibble zork quux", "bad")
    }.toDF("doc_id", "text", "label")
    val B = 256
    val st = Sampling.nbState(seed, "label", "text", buckets = B, salt = "t")
    val model = Sampling.nbModel(st, buckets = B)
    assert(model.count() === 2L * (B + 1),
      "model must cover the full (labels x buckets) grid + 2 priors")
    val test = Seq(
      (100L, "alpha gamma delta"),                  // pure good vocab
      (101L, "wibble blarg zork"),                  // pure bad vocab
      (102L, "alpha beta zork"),                    // majority good
      (103L, "...!!!...")                           // normalizes empty
    ).toDF("doc_id", "text")
    val byId = Sampling.nbClassify(test, model, "doc_id", "text",
        buckets = B, salt = "t")
      .select("doc_id", "predicted", "n_feats")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(byId(100L)._1 === "good" && byId(101L)._1 === "bad")
    assert(byId(102L)._1 === "good")
    // feature-less doc: n_feats 0, predicted = prior argmax (equal
    // doc counts -> tie breaks toward the LARGER label = "good")
    assert(byId(103L) === ("good", 0L))
    // grown state == one-shot state, bit-identically
    val a = seed.where(col("doc_id") < 20)
    val b = seed.where(col("doc_id") >= 20)
    def toMapSt(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    assert(toMapSt(Sampling.mergeNbStates(Seq(
      Sampling.nbState(a, "label", "text", B, "t"),
      Sampling.nbState(b, "label", "text", B, "t")))) === toMapSt(st))
  }

  test("hardLogitTrain: planted linear signal separates; weights are " +
      "partition-invariant; score uses the same exact activation") {
    val data = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 20L else 100L    // the signal
      val y = if (x1 >= 60) 1000000L else 0L
      (i.toLong, y, x1)
    }.toDF("id", "y", "x1")
    // center the feature (GD 101 — an uncentered feature makes the
    // bias learn |x| times slower than the slope)
    val feats = Seq(lit(1L), col("x1") - 60)
    def weights(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Long)] =
      Sampling.hardLogitTrain(df, col("y"), feats,
        iters = 10, etaDen = 1000)
        .as[(Int, Int, Long)].collect().toSeq.sorted
    val w = weights(data)
    // partition-invariant: gradients are order-free integer sums
    assert(weights(data.repartition(7)) === w)
    val wFinal = w.filter(_._1 == 10).map(_._3)
    val scored = Sampling.hardLogitScore(data, feats, wFinal)
    val acc = scored.where((col("kept") && col("y") === 1000000L) ||
      (!col("kept") && col("y") === 0L)).count()
    assert(acc === 200, s"planted signal must separate; weights $wFinal")
    // the activation saturates exactly at the clamp: score in [0, 1e6]
    val mm = scored.agg(min("score_ppm"), max("score_ppm")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 1000000L)
  }

  test("nbClassify plans a broadcast model join and no window/sort") {
    val seed = Seq((1L, "a b", "x"), (2L, "c d", "y"))
      .toDF("doc_id", "text", "label")
    val model = Sampling.nbModel(
      Sampling.nbState(seed, "label", "text", 64, "t"), 64)
    val plan = Sampling.nbClassify(seed.select("doc_id", "text"), model,
      "doc_id", "text", 64, "t").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"argmax must not window:\n$plan")
  }

  test("domainReweight: the hard domain gains weight monotonically, easy " +
      "ones shed it, and every round sums to exactly 1e6 ppm") {
    import spark.implicits._
    // three domains with PLANTED difficulty: per-doc loss 9e6 / 5e6 / 1e6
    val df = (0 until 300).map { i =>
      val dom = Seq("hard", "mid", "easy")(i % 3)
      val loss = Seq(9000000L, 5000000L, 1000000L)(i % 3)
      (dom, loss)
    }.toDF("domain", "loss")
    val w = Sampling.domainReweight(df, "domain", col("loss"),
        iters = 4, etaPpm = 500000L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // exact-sum invariant at EVERY iteration (consumable by samplers)
    (0 to 4).foreach { it =>
      assert(w.filter(_._1 == it).map(_._3).sum === 1000000L, s"iter $it")
    }
    def series(d: String) = (0 to 4).map(it =>
      w.find(t => t._1 == it && t._2 == d).get._3)
    val hard = series("hard"); val easy = series("easy")
    // monotone until saturation (the clamp caps each round at 2x, and
    // once the mixture mean reaches the hard domain the fixed point
    // holds): never a decrease for hard, never an increase for easy
    assert(hard.zip(hard.tail).forall { case (a, b) => b >= a },
      s"hard must never shed: $hard")
    assert(easy.zip(easy.tail).forall { case (a, b) => b <= a },
      s"easy must never gain: $easy")
    assert(hard.last > 400000L && easy.last < 250000L && hard.last > hard.head,
      s"final mixture should separate: hard=${hard.last} easy=${easy.last}")
    // uniform start: 333334/333333/333333 (largest-remainder by name)
    assert(w.filter(_._1 == 0).map(_._3).sorted.toSeq ===
      Seq(333333L, 333333L, 333334L))
  }
}
