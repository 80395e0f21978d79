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
  *   sbt "Test/runMain graft.tools.X106AB"
  */
object X106AB {
  def main(args: Array[String]): Unit = {
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
      val t0 = System.nanoTime()
      val m = Bpe.trainBatched(state, merges, batch = 16, window = 64)
      val sec = (System.nanoTime() - t0) / 1e9
      Console.err.println(f"[x106ab] merges=$merges%5d  $sec%8.2f s  " +
        f"${sec * 1000 / merges}%6.2f ms/merge  (learned ${m.size})")
      (sec, m)
    }

    run(64) // warm-up: JIT + state cache
    val (_, m250) = run(250)
    val (_, m500) = run(500)
    val (_, m1000) = run(1000)
    assert(m1000.take(250) == m250 && m1000.take(500) == m500,
      "prefix stability violated")
    Console.err.println("[x106ab] prefix stability: 1000-merge table " +
      "starts with the 250- and 500-merge tables — OK")

    // application at the same scale: segment the corpus under the
    // full 1000-merge table (the chunked dictionary walk — a single
    // 1000-deep replace projection would not compile)
    val t0 = System.nanoTime()
    val seg = Bpe.segmentCounts(names.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "doc_id", "text", m1000)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0)
    Console.err.println(f"[x106ab] segment under 1000 merges: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s  total_tokens=${seg.getLong(0)}")
    spark.stop()
  }
}
