package graft

import graft.operators.TxLog
import graft.sources.TxBounds
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** The `graft-tx` registered data source ([[graft.sources.TxDataSource]]):
  * tx tables through `spark.read.format` / `DataFrameWriter` / SQL
  * `CREATE ... USING` — reads carry masks, travel and manifest
  * pruning exactly like the Scala API (they ARE the Scala API
  * underneath), writes are real commits. Plus the pushed-filter →
  * manifest-bound translation unit pin. */
class TxSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txq_$tag").toString + "/t"

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"doc-$i")).toDF("id", "text")

  test("graft-tx: writer modes commit for real; reads mask, travel and " +
      "serve SQL views") {
    val root = freshRoot("dsrw")
    // default mode (errorifexists) creates a fresh table
    docs(0, 100).write.format("graft-tx").option("statsCol", "id").save(root)
    docs(100, 150).write.format("graft-tx").mode("append").save(root)
    TxLog.tombstone(spark, root, Seq(5L).toDF("id"), "id")
    val r = spark.read.format("graft-tx").load(root)
    assert(r.count() === 149, "the mask applies through the data source")
    assert(r.where(col("id") === 5L).count() === 0)
    // time travel via option
    assert(spark.read.format("graft-tx").option("versionAsOf", 1)
      .load(root).count() === 100)
    // a pure-SQL consumer: USING view + range predicate
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tx_v " +
      s"USING graft.sources.TxDataSource OPTIONS (path '$root')")
    assert(spark.sql(
      "SELECT count(*) AS n FROM tx_v WHERE id >= 10 AND id < 20")
      .head().getLong(0) === 10)
    assert(spark.sql("SELECT sum(id) AS s FROM tx_v").head().getLong(0) ===
      (0L until 150L).sum - 5L)
    // errorifexists refuses a second create; ignore is a no-op
    intercept[IllegalArgumentException] {
      docs(0, 5).write.format("graft-tx").save(root)
    }
    docs(0, 5).write.format("graft-tx").mode("ignore").save(root)
    assert(TxLog.latestVersion(spark, root) === 3L)
    // overwrite is a real rewrite commit: head replaced, history kept
    docs(0, 30).write.format("graft-tx").mode("overwrite").save(root)
    assert(spark.read.format("graft-tx").load(root).count() === 30)
    assert(TxLog.history(spark, root)
      .where(col("action") === "rewrite").count() === 1)
    assert(spark.read.format("graft-tx").option("versionAsOf", 2)
      .load(root).count() === 150, "pre-overwrite history still travels")
    // the writes recorded stats: a range read through the API prunes
    assert(TxLog.snapshotRange(spark, root, "id", 0L, 10L).count() === 10)
  }

  test("graft-tx: bucketed writer lands prunable layout; an emptied table " +
      "serves its pinned schema and zero rows, not an error") {
    val root = freshRoot("dsbk")
    docs(0, 400).write.format("graft-tx")
      .option("statsCol", "id").option("buckets", 8).save(root)
    assert(TxLog.liveFiles(spark, root)._2.size === 8,
      "one AddFile per key bucket")
    assert(spark.read.format("graft-tx").load(root).count() === 400)
    // empty the table via SQL-surface overwrite of nothing? no —
    // tombstone everything; the view must keep answering
    TxLog.tombstone(spark, root, docs(0, 400).select("id"), "id")
    // a full rewrite of the masked (empty) snapshot would need rows;
    // the DATA SOURCE read itself must serve the pin + zero rows
    val r = spark.read.format("graft-tx").load(root)
    assert(r.schema.fieldNames.toSeq === Seq("id", "text"))
    assert(r.count() === 0)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tx_empty_v " +
      s"USING graft.sources.TxDataSource OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM tx_empty_v")
      .head().getLong(0) === 0)
  }

  test("TxBounds: pushed filters collapse to per-column [lo, hi) manifest " +
      "bounds; non-long and OR-shaped filters are passed over") {
    def b(fs: Filter*) = TxBounds.boundsFrom(fs.toArray)
    assert(b(GreaterThanOrEqual("id", 10L), LessThan("id", 20L)) ===
      Seq(("id", 10L, 20L)))
    // equality is the unit interval; int widths widen
    assert(b(EqualTo("id", 7)) === Seq(("id", 7L, 8L)))
    // strict > bumps; <= bumps the exclusive end
    assert(b(GreaterThan("id", 9L), LessThanOrEqual("id", 19L)) ===
      Seq(("id", 10L, 20L)))
    // And trees flatten; two columns bound independently
    assert(b(And(GreaterThanOrEqual("a", 1L), LessThan("b", 5L))) ===
      Seq(("a", 1L, Long.MaxValue), ("b", Long.MinValue, 5L)))
    // conflicting bounds tighten to the intersection
    assert(b(GreaterThanOrEqual("id", 3L), GreaterThanOrEqual("id", 8L),
      LessThan("id", 100L), LessThan("id", 50L)) === Seq(("id", 8L, 50L)))
    // one-sided bounds still prune
    assert(b(LessThan("id", 42L)) === Seq(("id", Long.MinValue, 42L)))
    // none of these produce bounds: string value, OR tree, null check
    assert(b(EqualTo("s", "x"), Or(EqualTo("id", 1L), EqualTo("id", 9L)),
      IsNotNull("id")) === Seq.empty)
    // Long.MaxValue edges must not overflow
    assert(b(EqualTo("id", Long.MaxValue)) ===
      Seq(("id", Long.MaxValue, Long.MaxValue)))
    assert(b(GreaterThan("id", Long.MaxValue)) === Seq.empty)
  }
}
