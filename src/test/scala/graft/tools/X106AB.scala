package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Scale probe for BATCHED BPE training (the r8 verdict's capability
  * ceiling): does training time grow ~linearly in the merge budget
  * once re-symbolization is incremental and rounds batch
  * non-interacting merges? The naive trainer was O(R²) in replace
  * work and ran R sequential jobs — fine at 8 merges, infeasible at a
  * real 32k–50k vocabulary. Here we train 250 / 500 / 1000 merges on
  * the sf word state and report seconds plus ms-per-merge (flat
  * ms/merge = linear; the naive form would show ms/merge itself
  * growing linearly). Also asserts PREFIX STABILITY: the 1000-merge
  * table's first 250/500 rows ARE the smaller runs' tables — the
  * property that makes the oracle's truncation replay sound and lets
  * an operator extend a vocabulary without retraining from scratch.
  *
  *   sbt "Test/runMain graft.tools.X106AB"                 # 250 500 1000
  *   sbt "Test/runMain graft.tools.X106AB 2000 8000 --batch 48 --window 192"
  *
  * r10: budgets/batch/window are arguments so the production-budget
  * runs (2k/8k — VERDICT r9 item 1) use the same harness; prefix
  * stability is asserted across EVERY consecutive budget pair.
  */
object X106AB {
  def main(args: Array[String]): Unit = {
    val budgets = scala.collection.mutable.Buffer[Int]()
    var batch = 16
    var window = 64
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--batch" => batch = args(i + 1).toInt; i += 1
        case "--window" => window = args(i + 1).toInt; i += 1
        case n => budgets += n.toInt
      }
      i += 1
    }
    if (budgets.isEmpty) budgets ++= Seq(250, 500, 1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the documents corpus is template text with only ~31 distinct
    // words — its merge capacity exhausts near 90. The customer names
    // tokenize to ~15k distinct words (the id digit strings), a real
    // BPE-sized vocabulary, still straight from the testdata tables.
    val names = spark.read.parquet(s"$d/customer.parquet")
      .select(org.apache.spark.sql.functions.col("c_name").as("text"))
    val state = Bpe.wordState(names, "text").persist()
    Console.err.println(s"[x106ab] vocab = ${state.count()} words")

    def run(merges: Int): (Double, Seq[Bpe.Merge]) = {
      val rt = Runtime.getRuntime
      val t0 = System.nanoTime()
      val m = Bpe.trainBatched(state, merges, batch = batch, window = window)
      val sec = (System.nanoTime() - t0) / 1e9
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      Console.err.println(f"[x106ab] merges=$merges%5d  $sec%8.2f s  " +
        f"${sec * 1000 / merges}%6.2f ms/merge  (learned ${m.size}, " +
        f"driver heap used ${usedMb} MB)")
      (sec, m)
    }

    run(64) // warm-up: JIT + state cache
    val runs: Seq[(Int, (Double, Seq[Bpe.Merge]))] =
      budgets.toSeq.map(b => b -> run(b))
    runs.sliding(2).foreach { pair =>
      if (pair.size == 2) {
        val (bs, (_, ms)) = pair(0)
        val (bl, (_, ml)) = pair(1)
        assert(ml.take(ms.size) == ms,
          s"prefix stability violated between budgets $bs and $bl")
      }
    }
    Console.err.println("[x106ab] prefix stability: each larger-budget " +
      "table starts with every smaller one — OK")

    // application at the same scale: segment the corpus under the
    // largest merge table (the chunked dictionary walk — a single
    // deep replace projection would not compile)
    val mTop = runs.last._2._2
    val t0 = System.nanoTime()
    val seg = Bpe.segmentCounts(names.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "doc_id", "text", mTop)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0)
    Console.err.println(f"[x106ab] segment under ${mTop.size} merges: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s  total_tokens=${seg.getLong(0)}")
    spark.stop()
  }
}
