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
    // the WRITER honors the same contract: overwrite of the emptied
    // table lands the frame as a fresh commit (rewrite has no snapshot
    // to replace there — the pre-r15 form threw)
    docs(500, 520).write.format("graft-tx").mode("overwrite")
      .option("statsCol", "id").save(root)
    assert(spark.read.format("graft-tx").load(root).count() === 20)
  }

  test("SQL MERGE INTO lowers to the pruned TxLog.merge: upsert via " +
      "SET */INSERT *, delete-on-match via mergeDelete, unsupported " +
      "shapes refused loudly") {
    val root = freshRoot("dml_merge")
    TxLog.append(spark, root, docs(0, 400), Some("id"))
    TxLog.optimizeRange(spark, root, "id", buckets = 8)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_t " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    docs(100, 110).withColumn("text", upper(col("text")))
      .createOrReplaceTempView("dml_s")
    // a narrow-key upsert: 10 updates, one bucket's span
    spark.sql("""MERGE INTO dml_t t USING dml_s s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    // the write path PRUNED: keys 100..109 live in ONE of 8 buckets
    val mergeRow = TxLog.history(spark, root)
      .where(col("action") === "merge")
      .orderBy(col("version").desc).head()
    assert(mergeRow.getAs[Long]("n_removes") === 1,
      "a one-bucket-span SQL MERGE must stab exactly that bucket")
    // a disjoint-key upsert: pure inserts, zero dirs rewritten
    docs(800, 805).withColumn("text", upper(col("text")))
      .createOrReplaceTempView("dml_s2")
    spark.sql("""MERGE INTO dml_t t USING dml_s2 s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 405)
    assert(snap.where(col("text").rlike("^DOC-")).count() === 15)
    // delete-on-match
    spark.range(0, 50).selectExpr("id").createOrReplaceTempView("dml_d")
    spark.sql("""MERGE INTO dml_t t USING dml_d s ON t.id = s.id
                 WHEN MATCHED THEN DELETE""")
    assert(TxLog.snapshot(spark, root).count() === 355)
    // the CDC-apply staple: one statement carrying updates, inserts
    // AND flagged deletes — the deleteCol merge path from pure SQL
    docs(300, 305).union(docs(390, 393)).union(docs(900, 903))
      .withColumn("text", upper(col("text")))
      .withColumn("del", col("id") >= 390 && col("id") < 393)
      .createOrReplaceTempView("dml_cdc")
    spark.sql("""MERGE INTO dml_t t USING dml_cdc s ON t.id = s.id
                 WHEN MATCHED AND s.del THEN DELETE
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED AND NOT s.del THEN INSERT *""")
    val afterCdc = TxLog.snapshot(spark, root)
    assert(afterCdc.where(col("id") >= 390 && col("id") < 393)
      .count() === 0, "flagged matched keys delete")
    assert(afterCdc.where(col("id") >= 300 && col("id") < 305 &&
      col("text").rlike("^DOC-")).count() === 5, "unflagged keys update")
    assert(afterCdc.where(col("id") >= 900).count() === 3,
      "unflagged new keys insert")
    assert(afterCdc.count() === 355) // 355 - 3 deleted + 3 inserted
    // an UNGUARDED insert beside a conditional delete is refused (a
    // not-matched flagged row would have to insert — no keyed-merge
    // equivalent), with the guard named
    val exG = intercept[Exception] {
      spark.sql("""MERGE INTO dml_t t USING dml_cdc s ON t.id = s.id
                   WHEN MATCHED AND s.del THEN DELETE
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(exG.getMessage.contains("guard the"), exG.getMessage)
    // unsupported shapes are refused with the supported forms named
    val ex = intercept[Exception] {
      spark.sql("""MERGE INTO dml_t t USING dml_s s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET text = concat(s.text, '!')
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(ex.getMessage.contains("Supported shapes"), ex.getMessage)
  }

  test("SQL UPDATE and DELETE lower to the bounds-pruned predicate DML — " +
      "narrow WHERE rewrites few dirs; results exact") {
    val root = freshRoot("dml_ud")
    TxLog.append(spark, root, docs(0, 800), Some("id"))
    TxLog.optimizeRange(spark, root, "id", buckets = 8)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_u " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    spark.sql(
      "UPDATE dml_u SET text = upper(text) WHERE id >= 100 AND id < 150")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.where(col("text").rlike("^DOC-")).count() === 50)
    assert(snap.count() === 800)
    // the narrow WHERE touched ONE of 8 range buckets
    val upd = TxLog.history(spark, root)
      .where(col("action") === "update").head()
    assert(upd.getAs[Long]("n_removes") === 1,
      "id in [100,150) lives in exactly one 100-wide bucket")
    // an IN list compiles to the span of its members: a 3-key
    // takedown inside one bucket rewrites exactly that bucket
    spark.sql("DELETE FROM dml_u WHERE id IN (210, 230, 250)")
    val delIn = TxLog.history(spark, root)
      .where(col("action") === "delete")
      .orderBy(col("version").desc).head()
    assert(delIn.getAs[Long]("n_removes") === 1,
      "IN (210,230,250) spans one 100-wide bucket of 8")
    assert(TxLog.snapshot(spark, root).count() === 797)
    // DELETE with a non-boundable predicate still exact (full touch)
    spark.sql("DELETE FROM dml_u WHERE id % 100 = 7")
    assert(TxLog.snapshot(spark, root).count() === 789)
    // DELETE with bounds prunes
    spark.sql("DELETE FROM dml_u WHERE id >= 700")
    val del = TxLog.history(spark, root)
      .where(col("action") === "delete")
      .orderBy(col("version").desc).head()
    assert(del.getAs[Long]("n_removes") <= 2)
    assert(TxLog.snapshot(spark, root).count() === 690)
    // UPDATE without WHERE touches everything — full-table rewrite,
    // still exact (the condSql=None lowering)
    spark.sql("UPDATE dml_u SET text = lower(text)")
    assert(TxLog.snapshot(spark, root)
      .where(col("text").rlike("^doc-")).count() === 690)
    // a travel-read target refuses DML
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_past " +
      s"USING `graft-tx` OPTIONS (path '$root', versionAsOf '1')")
    val ex = intercept[Exception] {
      spark.sql("DELETE FROM dml_past WHERE id = 1")
    }
    assert(ex.getMessage.contains("travel"), ex.getMessage)
  }

  test("graft-tx pushes IS NULL through the null counters: a SQL view's " +
      "null probe answers exactly, and the probe read skips null-free dirs") {
    val root = freshRoot("dsnull")
    docs(0, 300).withColumn("score", col("id") * 2L)
      .write.format("graft-tx").option("statsCol", "score").save(root)
    TxLog.appendCols(spark, root,
      docs(300, 600).withColumn("score",
        when(col("id") % 6 === 0, lit(null).cast("long"))
          .otherwise(col("id") * 2L)),
      Seq("id", "score"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dsnull_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    assert(spark.sql("SELECT id FROM dsnull_v WHERE score IS NULL")
      .count() === 50)
    assert(spark.sql(
      "SELECT id FROM dsnull_v WHERE score IS NULL AND id >= 400")
      .count() === 33) // 402, 408, ..., 594
    // the underlying probe read touches only the null-carrying dir
    val probed = TxLog.snapshotRangeMulti(spark, root, Seq.empty, None,
      Seq("score"))
    val nullDirs = TxLog.liveFiles(spark, root)._2
      .filter(_.statFor("score#nulls").exists(_.max > 0L)).map(_.dir)
    assert(nullDirs.size === 1)
    assert(probed.inputFiles.nonEmpty &&
      probed.inputFiles.forall(f => nullDirs.exists(f.contains)))
  }

  test("SQL CTAS: CREATE TABLE ... USING graft-tx AS SELECT founds a real " +
      "tx table, registered in the catalog and DML-able by name") {
    val root = freshRoot("ctas")
    docs(0, 200).createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS ctas_t")
    spark.sql(s"""CREATE TABLE ctas_t USING `graft-tx`
                  OPTIONS (path '$root', statsCol 'id')
                  AS SELECT * FROM ctas_src""")
    // the CTAS landed a genuine commit: the Scala API reads it too
    assert(TxLog.latestVersion(spark, root) === 1L)
    assert(TxLog.snapshot(spark, root).count() === 200)
    assert(spark.table("ctas_t").count() === 200)
    // and the catalog NAME is a first-class DML target
    spark.sql("DELETE FROM ctas_t WHERE id >= 150")
    assert(spark.table("ctas_t").count() === 150)
    docs(100, 120).withColumn("text", upper(col("text")))
      .createOrReplaceTempView("ctas_upd")
    spark.sql("""MERGE INTO ctas_t t USING ctas_upd s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("ctas_t")
      .where(col("text").rlike("^DOC-")).count() === 20)
    assert(TxLog.snapshot(spark, root).count() === 150)
    // INSERT INTO appends a real commit; INSERT OVERWRITE replaces
    spark.sql("INSERT INTO ctas_t VALUES (500, 'ins-500'), (501, 'ins-501')")
    assert(spark.table("ctas_t").count() === 152)
    assert(TxLog.snapshot(spark, root)
      .where(col("text").startsWith("ins-")).count() === 2)
    spark.sql(
      "INSERT OVERWRITE ctas_t SELECT id, text FROM ctas_src WHERE id < 10")
    assert(spark.table("ctas_t").count() === 10)
    assert(TxLog.snapshot(spark, root).count() === 10)
    spark.sql("DROP TABLE ctas_t")
  }

  test("SQL maintenance statements: DESCRIBE HISTORY / DESCRIBE DETAIL " +
      "answer from the manifests; VACUUM DRY RUN names the reclaimable " +
      "dirs and the real VACUUM reclaims them") {
    val root = freshRoot("maint")
    TxLog.append(spark, root, docs(0, 100), Some("id"))
    TxLog.merge(spark, root,
      Seq((5L, "m-5")).toDF("id", "text"), "id")
    val hist = spark.sql(s"DESCRIBE HISTORY '$root'").collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "append"), (2L, "merge")))
    val det = spark.sql(s"DESCRIBE DETAIL '$root'").head()
    assert(det.getAs[Long]("version") === 2L)
    assert(det.getAs[Long]("phys_rows") === 100L) // the merge rewrote
    // the one touched dir (99 kept + 1 upsert), so live = 100 physical
    assert(det.getAs[String]("stats_col") === "id")
    // the merge orphaned v1's dir (removed, still referenced in the
    // retention window): push it out, then vacuum
    TxLog.append(spark, root, docs(100, 110), Some("id"))
    TxLog.append(spark, root, docs(110, 120), Some("id"))
    val dry = spark.sql(
      s"VACUUM '$root' RETAIN 2 VERSIONS GRACE 0 MS DRY RUN").collect()
    assert(dry.nonEmpty && dry.forall(!_.getBoolean(1)),
      "DRY RUN reports, reclaims nothing")
    assert(TxLog.snapshot(spark, root).count() === 120,
      "dry run must not delete")
    val real = spark.sql(
      s"VACUUM '$root' RETAIN 2 VERSIONS GRACE 0 MS").collect()
    assert(real.map(_.getString(0)).toSeq ===
      dry.map(_.getString(0)).toSeq)
    assert(real.forall(_.getBoolean(1)))
    assert(TxLog.snapshot(spark, root).count() === 120,
      "vacuum reclaims only unreachable dirs")
    // the vacuum recorded its horizon: DETAIL shows it and travel
    // below it is a named refusal
    assert(spark.sql(s"DESCRIBE DETAIL '$root'").head()
      .getAs[Long]("gc_horizon") > 0L)
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
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

  test("DELETE on a nullable column follows SQL three-valued logic: a " +
      "NULL predicate KEEPS the row — only TRUE deletes") {
    val root = freshRoot("dml_null")
    val rows = Seq((1L, Some(10L)), (2L, None), (3L, Some(3L)),
      (4L, None), (5L, Some(99L)))
      .toDF("id", "score")
    TxLog.append(spark, root, rows, Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_n " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    // score > 5 is NULL on ids 2 and 4 — they must SURVIVE: SQL
    // DELETE removes only rows where the predicate is TRUE
    spark.sql("DELETE FROM dml_n WHERE score > 5")
    val left = TxLog.snapshot(spark, root).select("id")
      .as[Long].collect().sorted
    assert(left === Array(2L, 3L, 4L),
      "NULL-predicate rows were deleted — three-valued logic violated")
    // the Scala API path directly, same rule
    TxLog.deleteWhere(spark, root, col("score") < 100)
    val left2 = TxLog.snapshot(spark, root).select("id")
      .as[Long].collect().sorted
    assert(left2 === Array(2L, 4L))
  }

  test("refusal-first DML: subqueries and nondeterministic expressions " +
      "are refused at the rule with the supported shapes named, not at " +
      "apply time with an opaque parse error") {
    val root = freshRoot("dml_refuse")
    TxLog.append(spark, root, docs(0, 50), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_r " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    val sub = intercept[Exception] {
      spark.sql("DELETE FROM dml_r WHERE id IN " +
        "(SELECT id FROM dml_r WHERE id < 5)")
    }
    assert(sub.getMessage.contains("subqueries"), sub.getMessage)
    val sub2 = intercept[Exception] {
      spark.sql("UPDATE dml_r SET text = 'x' WHERE " +
        "id = (SELECT max(id) FROM dml_r)")
    }
    assert(sub2.getMessage.contains("subqueries"), sub2.getMessage)
    val nd = intercept[Exception] {
      spark.sql("UPDATE dml_r SET text = uuid() WHERE id = 3")
    }
    assert(nd.getMessage.contains("nondeterministic"), nd.getMessage)
    val hof = intercept[Exception] {
      spark.sql("UPDATE dml_r SET text = array_join(" +
        "transform(split(text, '-'), x -> upper(x)), '-') WHERE id = 3")
    }
    assert(hof.getMessage.contains("higher-order"), hof.getMessage)
    // nothing committed by any refusal
    assert(TxLog.snapshot(spark, root).count() === 50)
    assert(TxLog.latestVersion(spark, root) === 1)
  }

  test("positional INSERT refuses incompatible types loudly instead of " +
      "coercing to null under ansi=false") {
    val root = freshRoot("ins_loud")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ins_l " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    // mis-ordered INSERT: string lands on the BIGINT slot — must fail
    // with the slot named, never write nulls
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO ins_l VALUES ('doc-x', 99)")
    }
    assert(ex.getMessage.contains("refuses incompatible types") ||
      ex.getMessage.contains("BIGINT"), ex.getMessage)
    assert(TxLog.snapshot(spark, root).count() === 10)
    // compatible widening still lands (INT value into BIGINT slot)
    spark.sql("INSERT INTO ins_l VALUES (99, 'doc-99')")
    assert(TxLog.snapshot(spark, root).count() === 11)
  }

  test("narrowing numeric INSERT raises on out-of-range values instead " +
      "of wrapping; in-range narrowing lands") {
    import spark.implicits._
    val root = freshRoot("ins_narrow")
    // an INT-typed pin: the canANSIStoreAssign gate alone would admit
    // a BIGINT source and the permissive cast would WRAP the overflow
    TxLog.append(spark, root,
      (0 until 10).map(i => (i, s"d-$i")).toDF("id", "text"), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ins_n " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    // 3e9 parses as BIGINT and overflows INT — must fail by name, at
    // execution, with nothing committed
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO ins_n VALUES (3000000000, 'boom')")
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("") + Option(t.getMessage).getOrElse("")
    }
    // Spark's own ANSI store-assignment layer fires first on the SQL
    // INSERT path (CAST_OVERFLOW_IN_TABLE_INSERT); LoudCast is the
    // backstop for sessions running LEGACY assignment — either way
    // the failure must be loud, with nothing wrapped
    assert(rootMsg(ex).contains("out of range") ||
      rootMsg(ex).toLowerCase.contains("overflow"), rootMsg(ex))
    assert(TxLog.snapshot(spark, root).count() === 10)
    assert(TxLog.snapshot(spark, root)
      .where(col("id") < 0).count() === 0, "no wrapped value landed")
    // an in-range BIGINT value still narrows fine
    spark.sql("INSERT INTO ins_n VALUES (CAST(99 AS BIGINT), 'ok')")
    assert(TxLog.snapshot(spark, root).count() === 11)
    assert(TxLog.snapshot(spark, root)
      .where(col("id") === 99).count() === 1)
    // MERGE is resolved by OUR rule — Spark never pre-casts there, so
    // LoudCast is the ONLY layer between a BIGINT source column and a
    // wrapped INT slot: out-of-range raises by name, nothing commits.
    // (The key stays BIGINT=BIGINT — a coerced ON equality would trip
    // the shape refusal before the value path under test.)
    val mroot = freshRoot("mrg_narrow")
    TxLog.append(spark, mroot,
      (0 until 10).map(i => (i.toLong, i)).toDF("id", "n"), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_n " +
      s"USING `graft-tx` OPTIONS (path '$mroot')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_n_src AS " +
      "SELECT CAST(3 AS BIGINT) AS id, CAST(3000000000 AS BIGINT) AS n")
    val mex = intercept[Exception] {
      spark.sql("""MERGE INTO mrg_n t USING mrg_n_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(rootMsg(mex).contains("out of range"), rootMsg(mex))
    assert(TxLog.snapshot(spark, mroot)
      .where(col("n") < 0).count() === 0, "no wrapped value landed")
    assert(TxLog.snapshot(spark, mroot).count() === 10)
    // in-range BIGINT source merges fine through the same path
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_n_src2 AS " +
      "SELECT CAST(3 AS BIGINT) AS id, CAST(777 AS BIGINT) AS n")
    spark.sql("""MERGE INTO mrg_n t USING mrg_n_src2 s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(TxLog.snapshot(spark, mroot)
      .where(col("id") === 3 && col("n") === 777).count() === 1)
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns auto-add with " +
      "typed-null backfill, a wider source widens the slot, conflicts " +
      "evolution cannot express refuse loudly") {
    import spark.implicits._
    val root = freshRoot("mrg_evo")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    // the evolving CDC feed gained a column: n INT rides in
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e_s1 AS " +
      "SELECT CAST(id AS BIGINT) AS id, concat('v2-', id) AS text, " +
      "CAST(id * 10 AS INT) AS n FROM range(5, 12)")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrg_e t USING mrg_e_s1 s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val snap1 = TxLog.snapshot(spark, root)
    assert(snap1.columns.toSeq === Seq("id", "text", "n"))
    assert(snap1.count() === 12)
    assert(snap1.where(col("id") < 5 && col("n").isNull).count() === 5,
      "pre-evolution rows read the new column as typed nulls")
    assert(snap1.where(col("id") === 7 && col("n") === 70).count() === 1)
    // the evolution is its own audited commit before the merge
    val hist = TxLog.history(spark, root)
    assert(hist.where(col("action") === "evolve").count() === 1)
    // a WIDER source widens the slot: n arrives as BIGINT now
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e_s2 AS " +
      "SELECT CAST(20 AS BIGINT) AS id, 'w' AS text, " +
      "CAST(3000000000 AS BIGINT) AS n")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrg_e t USING mrg_e_s2 s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val snap2 = TxLog.snapshot(spark, root)
    assert(snap2.schema("n").dataType ===
      org.apache.spark.sql.types.LongType, "int slot widened to bigint")
    assert(snap2.where(col("n") === 3000000000L).count() === 1)
    // a source that FITS the pin commits no extra evolution
    val evos = TxLog.history(spark, root)
      .where(col("action") === "evolve").count()
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e_s3 AS " +
      "SELECT CAST(1 AS BIGINT) AS id, 'fit' AS text, " +
      "CAST(11 AS BIGINT) AS n")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrg_e t USING mrg_e_s3 s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(TxLog.history(spark, root)
      .where(col("action") === "evolve").count() === evos,
      "a fitting source must not commit a no-op evolution")
    // a STRING source over the numeric slot is not evolvable — loud
    // refusal (reinterpretation, not widening), nothing committed
    val head = TxLog.latestVersion(spark, root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e_s4 AS " +
      "SELECT CAST(2 AS BIGINT) AS id, 'x' AS text, 'NaN' AS n")
    val ex = intercept[Exception] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO mrg_e t USING mrg_e_s4 s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(ex.getMessage.contains("widening") ||
      ex.getMessage.contains("coercion"), ex.getMessage)
    assert(TxLog.latestVersion(spark, root) === head,
      "the refused statement must commit nothing")
    // WITHOUT the keyword, an extra source column is still refused
    // (the r15 contract: evolution is an explicit opt-in)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_e_s5 AS " +
      "SELECT CAST(2 AS BIGINT) AS id, 'y' AS text, " +
      "CAST(1 AS BIGINT) AS n, 'extra' AS z")
    val snapBefore = TxLog.latestVersion(spark, root)
    spark.sql(
      """MERGE INTO mrg_e t USING mrg_e_s5 s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    // plain MERGE ignores unmapped source extras (SET * covers the
    // pin only) — the column set must be unchanged
    assert(TxLog.snapshot(spark, root).columns.toSeq ===
      Seq("id", "text", "n"))
    assert(TxLog.latestVersion(spark, root) === snapBefore + 1)
  }
}
