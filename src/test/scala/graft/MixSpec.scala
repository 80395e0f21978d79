package graft

import graft.pipeline.RunMix
import org.apache.spark.sql.functions._

/** End-to-end contract of the RunMix training-mix journey: epoch
  * determinism (the resume property), per-band sampling policy,
  * sequence-budget overhang rule, and the source-weight mixture. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mix_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("RunMix: epoch replay is identical; different epochs reorder, same survivors") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val outA = tmp("a"); val outB = tmp("b"); val outC = tmp("c")
    val repA = RunMix.run(spark, docs, outA, epoch = 0, budget = 128).toMap
    val repB = RunMix.run(spark, docs, outB, epoch = 0, budget = 128).toMap
    assert(repA == repB, "same-epoch reruns must report identical counts")
    val a = spark.read.parquet(s"$outA/packed")
    val b = spark.read.parquet(s"$outB/packed")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "same-epoch reruns must pack row-identically")
    // a different epoch keeps the SAME survivor set (sampling is
    // epoch-independent) but draws an independent order
    val repC = RunMix.run(spark, docs, outC, epoch = 1, budget = 128).toMap
    assert(repC("sampled") == repA("sampled") &&
      repC("tokens_packed") == repA("tokens_packed"))
    val c = spark.read.parquet(s"$outC/packed")
    assert(a.select("doc_id").exceptAll(c.select("doc_id")).count() == 0)
    assert(a.select("doc_id", "chunk", "seq")
      .exceptAll(c.select("doc_id", "chunk", "seq")).count() > 0,
      "epoch 1 must place documents differently")
  }

  test("RunMix: band policy thins low-quality bands; packing respects the budget") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = tmp("policy")
    RunMix.run(spark, docs, out, epoch = 0, budget = 128,
      bandRates = Map(1 -> 0.0, 2 -> 0.5, 3 -> 1.0, 4 -> 1.0))
    val packed = spark.read.parquet(s"$out/packed")
    // band 1 is dropped entirely; bands 3-4 survive whole
    assert(packed.where(col("bucket") === 1).count() == 0)
    val byBand = packed.groupBy("bucket").count()
      .as[(Int, Long)].collect().toMap
    assert(byBand.contains(3) && byBand.contains(4))
    // the packing running sum is REAL, not just seq's definition:
    // within each chunk, rows sorted by start_off must be CONTIGUOUS
    // (each start = previous start + previous n_tokens, first = 0) —
    // a broken window frame (double-counting, wrong ordering) breaks
    // this immediately
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk").orderBy("start_off")
    val gaps = packed
      .withColumn("__expect",
        coalesce(lag(col("start_off") + col("n_tokens"), 1).over(w), lit(0L)))
      .where(col("start_off") =!= col("__expect"))
      .count()
    assert(gaps == 0, s"$gaps non-contiguous packing offsets")
    // source-weight mixture: dropping a source from the map removes it
    val out2 = tmp("mixture")
    RunMix.run(spark, docs, out2, epoch = 0, budget = 128,
      sourceWeights = Some(Map("src0" -> 1.0, "src1" -> 0.5)))
    val mixed = spark.read.parquet(s"$out2/packed")
    val srcs = mixed.select("source_name").distinct().as[String]
      .collect().toSet
    assert(srcs == Set("src0", "src1"), s"unexpected sources: $srcs")
    // src0 at weight 1.0 keeps all its band survivors; src1 at 0.5
    // keeps a strict subset of its own
    val bySrc = mixed.groupBy("source_name").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src1") < bySrc("src0"),
      s"weight 0.5 must thin src1 below src0: $bySrc")
  }

  test("RunMix: re-banding against the recorded threshold artifact replays exactly") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val outA = tmp("art_a"); val outB = tmp("art_b")
    RunMix.run(spark, docs, outA, epoch = 0, budget = 128)
    // read the artifact back from report.json (the resume journey)
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(outA, "report.json"))
    val ths = """"thresholds":\[([^\]]*)\]""".r
      .findFirstMatchIn(json).get.group(1)
      .split(",").map(_.toDouble).toSeq
    assert(ths.size == RunMix.defaultBandRates.size - 1 &&
      ths == ths.sorted)
    RunMix.run(spark, docs, outB, epoch = 0, budget = 128,
      thresholds = Some(ths))
    val a = spark.read.parquet(s"$outA/packed")
    val b = spark.read.parquet(s"$outB/packed")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "resume with the recorded thresholds must re-pack row-identically")
  }
}
