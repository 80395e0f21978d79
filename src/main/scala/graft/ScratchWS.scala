package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object ScratchWS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      // warm twice, report best of 3
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      Console.err.println(f"[ws] $name%-28s best ${ts.map(_._1).min}%7.3f s  (${ts.map(a => f"${a._1}%.2f").mkString(",")})  rows=${ts.head._2}")
    }
    time("arrays (tokenize+shingle)") {
      Dedup.shingleHashArrays(docs, "doc_id", "text", 3).select("id").count()
    }
    time("base (arrays+sig)") {
      Dedup.minHashBaseFromArrays(
        Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64).select("id").count()
    }
    def fullNoCkpt(): Long = {
      val base = Dedup.minHashBaseFromArrays(
        Dedup.shingleHashArrays(docs, "doc_id", "text", 3), 64)
      Dedup.minHashDupPairsFromBase(base, 64, 16, 0.5, 1000,
        checkpointBase = false).count()
    }
    time("full WITH localCheckpoint") {
      Dedup.minHashDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }
    time("full NO checkpoint") { fullNoCkpt() }
    spark.stop()
  }
}
