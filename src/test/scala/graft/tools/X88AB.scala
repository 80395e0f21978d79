package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Bpe

/** A/B: the x88 BPE training floor is 8 SEQUENTIAL vocab-table jobs
  * (pair hash agg + limit(1) collect per round), so per-round task
  * overhead — not data volume — may dominate at bench scale: the
  * word state is ~60k rows spread over 32 shuffle partitions, i.e.
  * ~2k rows per task per round. Hypothesis: coalescing the persisted
  * state to fewer partitions cuts per-round scheduling cost without
  * touching the algebra (identical merges — asserted here).
  * At 100 TB the vocab is Zipf-bounded but still large (~100M words);
  * the right production shape is whatever partition count keeps tasks
  * in the millisecond-to-second band, so if B wins we expose a knob,
  * not a hardcoded 8.
  *
  *   sbt "Test/runMain graft.tools.X88AB"
  */
object X88AB {
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
    spark.read.parquet(s"$d/region.parquet").count()

    def time(name: String, reps: Int = 5)(f: => Int): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      Console.err.println(f"[x88ab] $name%-34s min $best%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  merges=${ts.head._2}")
      best
    }

    val docs = graft.Tables.documents(spark, d)
    def state: DataFrame = Bpe.wordState(docs, "text")

    var a: Seq[Bpe.Merge] = Nil
    var b: Seq[Bpe.Merge] = Nil
    time("A: train on 32-partition state") { a = Bpe.train(state, 8); a.size }
    time("B: train on coalesce(4) state") {
      b = Bpe.train(state.coalesce(4), 8); b.size
    }
    var c: Seq[Bpe.Merge] = Nil
    time("C: train on repartition(1) state") {
      c = Bpe.train(state.repartition(1), 8); c.size
    }
    assert(a == b && b == c, s"merge tables must be identical: $a vs $b vs $c")
    Console.err.println("[x88ab] identical merges across all layouts — OK")
    spark.stop()
  }
}
