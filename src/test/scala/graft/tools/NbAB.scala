package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Stage-level timing for the x153 NB classify headline: where does
  * the wall-clock actually go (train scan / model derivation /
  * classify join) at sf0.1? min-of-N per stage, one session.
  *
  *   sbt "Test/runMain graft.tools.NbAB"
  */
object NbAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet(s"$d/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[nbab] $tag%-28s min ${ts.map(_._1).min}%7.3f s  " +
        f"(reps ${ts.map(t => f"${t._1}%.3f").mkString(",")})  n=${ts.head._2}")
    }
    time("state (train scan)") {
      Sampling.nbState(doc.where(col("doc_id") % 2 === 0), "lang", "text")
        .count()
    }
    time("dsirState (same machinery)") {
      Sampling.dsirState(doc.where(col("doc_id") % 2 === 0), "text")
        .count()
    }
    time("tokens only") {
      doc.where(col("doc_id") % 2 === 0)
        .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
          .as("t"))
        .groupBy("t").count().count()
    }
    time("tokens + md5 bucket") {
      doc.where(col("doc_id") % 2 === 0)
        .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
          .as("t"))
        .select((conv(substring(md5(concat_ws(":", lit("nb"), col("t"))),
          1, 15), 16, 10).cast("long") % 1024).cast("int").as("b"))
        .groupBy("b").count().count()
    }
    time("feats: reference HOF chain") {
      doc.where(col("doc_id") % 2 === 0)
        .select(explode(Sampling.hashedNgramBucketsReference(col("text"),
          1024, "nb")).as("b"))
        .groupBy("b").count().count()
    }
    time("feats: native NgramBuckets") {
      doc.where(col("doc_id") % 2 === 0)
        .select(explode(graft.functions.NgramBuckets.column(col("text"),
          1024, "nb")).as("b"))
        .groupBy("b").count().count()
    }
    // parity: native == reference, per document, across the corpus
    val mismatches = doc.select(col("doc_id"),
        graft.functions.NgramBuckets.column(col("text"), 1024, "nb")
          .as("native"),
        Sampling.hashedNgramBucketsReference(col("text"), 1024, "nb")
          .as("ref"))
      .where(not(col("native") <=> col("ref"))).count()
    println(s"[nbab] native-vs-reference mismatched docs: $mismatches")
    val st = Sampling.nbState(doc.where(col("doc_id") % 2 === 0),
      "lang", "text")
    time("model (from state)") { Sampling.nbModel(st).count() }
    val m = Sampling.nbModel(st)
    time("classify (frozen model)") {
      Sampling.nbClassify(doc.where(col("doc_id") % 2 === 1), m,
        "doc_id", "text").count()
    }
    time("end-to-end (x153 shape)") {
      val mm = Sampling.nbModel(Sampling.nbState(
        doc.where(col("doc_id") % 2 === 0), "lang", "text"))
      Sampling.nbClassify(doc.where(col("doc_id") % 2 === 1), mm,
        "doc_id", "text").count()
    }
    spark.stop()
  }
}
