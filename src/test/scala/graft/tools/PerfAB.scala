package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, IvfAnn, Similarity}

/** Dev-loop A/B measurement harness (test scope, never shipped):
  * reconstructs the interpreted HOF forms that the codegen'd
  * expressions replaced and measures both on sf0.1, asserting
  * bit-identical results while timing. Run:
  *
  *   sbt "Test/runMain graft.tools.PerfAB"
  *
  * Sections: sign-LSH bucketing (HyperplaneBucket vs per-plane
  * aggregate/zip_with folds), IVF integer assignment (NearestCellsInt
  * vs per-centroid folds), MinHash checkpoint behavior (warm-run
  * repeats for the x03 anomaly).
  */
object PerfAB {
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
    val emb = Tables.embeddings(spark, d)
    val docs = Tables.documents(spark, d)

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      Console.err.println(f"[ab] $name%-34s best ${ts.map(_._1).min}%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
    }

    // ---- the replaced HOF forms, reconstructed for comparison ----
    def hofBucket(vec: Column, dim: Int, planes: Int): Column = {
      val ps = Similarity.portablePlanes(dim, planes)
      val q = transform(vec, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
      val bits = ps.zipWithIndex.map { case (p, i) =>
        val proj = aggregate(zip_with(q, lit(p.toArray), (x, w) => x * w),
          lit(0L), (acc, v) => acc + v)
        shiftleft(when(proj >= 0, lit(1L)).otherwise(lit(0L)), i)
      }
      bits.reduce(_.bitwiseOR(_))
    }
    def hofCellIdInt(vec: Column, cents: Array[IvfAnn.IntCentroid]): Column = {
      val q = transform(vec, x => floor(x.cast("double") * lit(1000.0)).cast("long"))
      val scored = cents.map { c =>
        val terms = zip_with(q, lit(c.c), (qq, cd) => { val t = qq - cd; t * t })
        struct(aggregate(terms, lit(0L), (acc, v) => acc + v).as("d"),
          lit(c.cell).as("i"))
      }
      least(scored.toIndexedSeq: _*).getField("i")
    }

    val dim = 64; val planes = 16
    val mismB = emb.select(
      hofBucket(col("embedding"), dim, planes).as("a"),
      Similarity.hyperplaneBucket(col("embedding"), dim, planes).as("b"))
      .where(col("a") =!= col("b")).count()
    Console.err.println(s"[ab] bucket mismatches (HOF vs codegen): $mismB")
    time("bucket HOF (16 planes)") {
      emb.select(hofBucket(col("embedding"), dim, planes).as("b"))
        .agg(sum("b")).collect(); emb.count()
    }
    time("bucket codegen (16 planes)") {
      emb.select(Similarity.hyperplaneBucket(col("embedding"), dim, planes).as("b"))
        .agg(sum("b")).collect(); emb.count()
    }

    val cents = IvfAnn.seedCentroidsInt(emb, "vec_id", "embedding", nlist = 16)
    val mismC = emb.select(
      hofCellIdInt(col("embedding"), cents).as("a"),
      IvfAnn.cellIdInt(col("embedding"), cents).as("b"))
      .where(col("a") =!= col("b")).count()
    Console.err.println(s"[ab] ivf-cell mismatches (HOF vs codegen): $mismC")
    time("ivf assign HOF (nlist 16)") {
      emb.select(hofCellIdInt(col("embedding"), cents).as("c"))
        .agg(sum("c")).collect(); emb.count()
    }
    time("ivf assign codegen (nlist 16)") {
      emb.select(IvfAnn.cellIdInt(col("embedding"), cents).as("c"))
        .agg(sum("c")).collect(); emb.count()
    }

    // ---- top-k tail: row_number window vs bounded TopKPairs agg ----
    {
      import org.apache.spark.sql.expressions.Window
      val c = graft.operators.Rebalance(emb.select(col("vec_id"), col("embedding")))
        .withColumn("__cn", Similarity.norm(col("embedding")))
      val q = emb.limit(20).select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec"))
        .withColumn("__qn", Similarity.norm(col("q_vec")))
      val joined = c.join(broadcast(q))
        .where(col("q_id") =!= col("vec_id"))
        .withColumn("cosine", Similarity.cosineWithNorms(
          col("q_vec"), col("embedding"), col("__qn"), col("__cn")))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cosine").desc, col("vec_id").asc)
      val winForm = joined.withColumn("rank",
          org.apache.spark.sql.functions.row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
          col("cosine"), col("rank"))
      val aggForm = Similarity.bruteForceTopK(emb, q.drop("__qn"),
        "vec_id", "embedding", "q_id", "q_vec", k = 5)
      val mismT = winForm.exceptAll(aggForm).count() + aggForm.exceptAll(winForm).count()
      Console.err.println(s"[ab] topk mismatches (window vs agg): $mismT")
      time("topk window form") { winForm.count() }
      time("topk bounded agg form") { aggForm.count() }
    }

    // ---- x03 warm-run behavior (checkpoint block accumulation) ----
    time("x03 minhash pairs (5 reps)", reps = 5) {
      val n = Dedup.minHashDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
      Console.err.println(s"[ab]   released ckpts: ${Dedup.releaseCheckpoints()}")
      n
    }

    // ---- x03 pair generation: bucket self-join vs grouped pair expl ----
    {
      val base = Dedup.minHashBaseFromArrays(
        Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64)
      val banded = Dedup.lshBandRows(base, 64, 16)
      // current shape: size-capped self-join + distinct
      def joinPairs(): Long = {
        val sizes = banded.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
        val capped = banded.join(
          sizes.where(col("__n") <= 1000).drop("__n"), Seq("band", "bucket"))
        capped.as("l").join(capped.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
          .distinct().count()
      }
      // candidate shape: group ids per bucket, generate pairs in-row
      // (HOF form — interpreted; a codegen Expression would be faster)
      def groupPairs(): Long = {
        val buckets = banded.groupBy("band", "bucket")
          .agg(collect_list("id").as("ids"))
          .where(size(col("ids")).between(2, 1000))
        buckets.select(explode(flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i.cast("int") + 2, lit(1000000)),
              y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b")))))).as("p"))
          .select(col("p.id_a"), col("p.id_b"))
          .distinct().count()
      }
      val a = joinPairs(); val b = groupPairs()
      Console.err.println(s"[ab] pairgen counts join=$a group=$b (must match)")
      time("pairgen self-join") { joinPairs() }
      time("pairgen grouped HOF") { groupPairs() }
    }

    // ---- decompose the ~1.5s checkpoint cost (r2 verdict finding) ----
    def base() = Dedup.minHashBaseFromArrays(
      Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64)
    def rddOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    time("x03 base count (no ckpt)") { base().count() }
    time("x03 base eager localCkpt") {
      val cp = base().localCheckpoint()
      val n = cp.count()
      rddOf(cp).foreach(_.unpersist(false))
      n
    }
    time("x03 pairs NO ckpt") {
      Dedup.minHashDupPairsFromBase(base(), 64, 16, 0.5, 1000,
        checkpointBase = false).count()
    }
    spark.stop()
  }
}
