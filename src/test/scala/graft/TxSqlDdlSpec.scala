package graft

import graft.operators.TxLog
import org.apache.spark.sql.functions._

/** The r16 SQL door additions ([[graft.sources.GraftSqlParser]]):
  * read-side TIME TRAVEL (`VERSION AS OF` / `TIMESTAMP AS OF` riding
  * Spark's own grammar, rewritten into the relation's travel options
  * before the v1-refusing analyzer sees them), `ALTER TABLE`
  * ADD/ALTER TYPE/RENAME/DROP COLUMN onto the evolution machinery,
  * `OPTIMIZE` / `RESTORE TABLE`, and NAME-addressed maintenance
  * (DESCRIBE HISTORY/DETAIL/VACUUM by temp-view or catalog-table
  * name, not just path literal). */
class TxSqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ddl_$tag").toString + "/t"

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"doc-$i")).toDF("id", "text")

  test("SQL time travel: VERSION AS OF resolves every historical version " +
      "through a plain SELECT; TIMESTAMP AS OF maps to the version live " +
      "at that instant; head reads are untouched") {
    val root = freshRoot("travel")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    TxLog.append(spark, root, docs(10, 30), Some("id"))
    val tMid = System.currentTimeMillis()
    Thread.sleep(5)
    TxLog.append(spark, root, docs(30, 60), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tt_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM tt_v").head().getLong(0)
      === 60)
    assert(spark.sql("SELECT count(*) AS n FROM tt_v VERSION AS OF 1")
      .head().getLong(0) === 10)
    assert(spark.sql("SELECT count(*) AS n FROM tt_v VERSION AS OF 2")
      .head().getLong(0) === 30)
    // travel composes with ordinary SQL (joins, aliases, aggregates)
    assert(spark.sql(
      """SELECT count(*) AS n FROM tt_v cur
         JOIN tt_v VERSION AS OF 1 old ON cur.id = old.id""")
      .head().getLong(0) === 10)
    // TIMESTAMP AS OF: an instant between v2 and v3 reads v2
    // (formatted in UTC — the suite pins the session zone there)
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(tMid))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tt_v TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 30)
    // a version beyond the head is refused BY NAME (not silently
    // folded to the head)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM tt_v VERSION AS OF 99").collect()
    }
    assert(ex.getMessage.contains("versions 1..3"), ex.getMessage)
  }

  test("SQL time travel rides the clone chain and rename lineage: a " +
      "travel read below a clone cut resolves base dirs; a pre-rename " +
      "version serves the OLD column name") {
    val src = freshRoot("tcsrc")
    TxLog.append(spark, src, docs(0, 40), Some("id"))
    TxLog.append(spark, src, docs(40, 80), Some("id"))
    val dst = freshRoot("tcdst")
    val cut = TxLog.cloneTable(spark, src, dst)
    TxLog.append(spark, dst, docs(80, 100), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tt_clone " +
      s"USING `graft-tx` OPTIONS (path '$dst')")
    // below the cut: pre-fork dirs are base-resident — the travel read
    // must resolve them through the head chain
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tt_clone VERSION AS OF ${cut - 1}")
      .head().getLong(0) === 80)
    assert(spark.sql("SELECT count(*) AS n FROM tt_clone VERSION AS OF 1")
      .head().getLong(0) === 40)
    // rename lineage: rename id -> doc_key, travel below the rename
    // still reads the OLD schema (that version's readers' view).
    // The view re-creates after the rename — a USING temp view
    // freezes its schema at creation (Spark's contract, not ours)
    TxLog.renameColumn(spark, dst, "id", "doc_key")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tt_clone " +
      s"USING `graft-tx` OPTIONS (path '$dst')")
    val head = spark.sql("SELECT doc_key FROM tt_clone").columns
    assert(head === Array("doc_key"))
    val old = spark.sql(
      s"SELECT * FROM tt_clone VERSION AS OF ${cut + 1}").columns
    assert(old.contains("id") && !old.contains("doc_key"),
      s"pre-rename travel must serve the old name, got ${old.mkString(",")}")
  }

  test("travel refusals: DML on a travel view and travel-on-travel are " +
      "both loud") {
    val root = freshRoot("trefuse")
    TxLog.append(spark, root, docs(0, 10), Some("id"))
    TxLog.append(spark, root, docs(10, 20), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tr_past " +
      s"USING `graft-tx` OPTIONS (path '$root', versionAsOf '1')")
    val dml = intercept[Exception] {
      spark.sql("DELETE FROM tr_past WHERE id = 1")
    }
    assert(dml.getMessage.contains("travel"), dml.getMessage)
    val tot = intercept[Exception] {
      spark.sql("SELECT * FROM tr_past VERSION AS OF 1").collect()
    }
    assert(tot.getMessage.contains("ambiguous"), tot.getMessage)
  }

  test("SQL ALTER TABLE: the full evolve-rename-drop life from SQL — " +
      "add, widen, rename (lineage-checked), drop; hazards refused") {
    val root = freshRoot("alter")
    val d = (0 until 50).map(i => (i.toLong, i, s"doc-$i"))
      .toDF("id", "score", "text")
    TxLog.append(spark, root, d, Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW alt_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    // ADD COLUMNS: old rows read as typed nulls
    spark.sql("ALTER TABLE alt_v ADD COLUMNS (lang STRING, w BIGINT)")
    val snap1 = TxLog.snapshot(spark, root)
    assert(snap1.columns === Array("id", "score", "text", "lang", "w"))
    assert(snap1.where(col("lang").isNull).count() === 50)
    // ALTER COLUMN TYPE: lossless widening int -> bigint
    spark.sql("ALTER TABLE alt_v ALTER COLUMN score TYPE BIGINT")
    assert(TxLog.snapshot(spark, root).schema("score").dataType ===
      org.apache.spark.sql.types.LongType)
    // narrowing refused with the rule named
    val nar = intercept[Exception] {
      spark.sql("ALTER TABLE alt_v ALTER COLUMN score TYPE INT")
    }
    assert(nar.getMessage.contains("widening"), nar.getMessage)
    // re-adding refused
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE alt_v ADD COLUMNS (score BIGINT)")
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // RENAME COLUMN: metadata-only; pre-rename data still reads
    spark.sql("ALTER TABLE alt_v RENAME COLUMN text TO body")
    val snap2 = TxLog.snapshot(spark, root)
    assert(snap2.columns.contains("body") && !snap2.columns.contains("text"))
    assert(snap2.where(col("body").rlike("^doc-")).count() === 50)
    // DROP COLUMN: gone from reads; id data intact
    spark.sql("ALTER TABLE alt_v DROP COLUMN w")
    val snap3 = TxLog.snapshot(spark, root)
    assert(!snap3.columns.contains("w"))
    assert(snap3.agg(sum("id")).head().getLong(0) === (0 until 50).sum)
    // the x182 hazard: a live tombstone on a column refuses its drop
    TxLog.tombstone(spark, root, Seq(3L).toDF("id"), "id")
    val tomb = intercept[Exception] {
      spark.sql("ALTER TABLE alt_v DROP COLUMN id")
    }
    assert(tomb.getMessage.toLowerCase.contains("tombstone"),
      tomb.getMessage)
  }

  test("SQL OPTIMIZE and RESTORE: layout statements land the same pruned " +
      "commits as the Scala calls; RESTORE TO VERSION AS OF rewinds the " +
      "live set as a new commit") {
    val root = freshRoot("opt")
    TxLog.append(spark, root, docs(0, 400), Some("id"))
    TxLog.append(spark, root, docs(400, 800), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW opt_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    val r1 = spark.sql("OPTIMIZE opt_v RANGE(id, 8)").head()
    assert(r1.getString(0) === "optimizeRange" && r1.getLong(1) === 3L)
    // the range layout prunes: a narrow read touches 1 of 8 dirs
    val pruned = TxLog.snapshotRange(spark, root, "id", 100, 150)
    assert(pruned.count() === 50)
    assert(pruned.inputFiles.length <= 2,
      s"RANGE(8) must prune a 50-wide probe, read ${pruned.inputFiles.length}")
    // other layouts parse + commit
    spark.sql("OPTIMIZE opt_v HASH(id, 4)")
    spark.sql("OPTIMIZE opt_v COMPACT(1000000)")
    // bad shape: loud with the supported forms named
    val bad = intercept[Exception] {
      spark.sql("OPTIMIZE opt_v RANGE(id)")
    }
    assert(bad.getMessage.contains("Supported"), bad.getMessage)
    // RESTORE: back to v1's 400 rows, as a NEW commit
    val before = TxLog.latestVersion(spark, root)
    val rr = spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 1").head()
    assert(rr.getLong(0) === before + 1)
    assert(TxLog.snapshot(spark, root).count() === 400)
    // history is append-only: the pre-restore head still travel-reads
    assert(spark.sql(
      s"SELECT count(*) AS n FROM opt_v VERSION AS OF $before")
      .head().getLong(0) === 800)
  }

  test("SQL SHALLOW CLONE: CREATE TABLE '<dst>' SHALLOW CLONE <src> is " +
      "the zero-copy fork — identical at the cut, divergent after, " +
      "source addressable by name") {
    val src = freshRoot("clsrc")
    val dst = freshRoot("cldst")
    TxLog.append(spark, src, docs(0, 60), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cl_src_v " +
      s"USING `graft-tx` OPTIONS (path '$src')")
    val cut = spark.sql(
      s"CREATE TABLE '$dst' SHALLOW CLONE cl_src_v").head().getLong(0)
    assert(cut === 2L)
    // zero-copy: no local data dirs in the fork
    assert(!new java.io.File(s"$dst/data").exists())
    assert(TxLog.snapshot(spark, dst).count() === 60)
    // divergence both ways
    TxLog.append(spark, dst, docs(60, 70), Some("id"))
    TxLog.append(spark, src, docs(60, 100), Some("id"))
    assert(TxLog.snapshot(spark, dst).count() === 70)
    assert(TxLog.snapshot(spark, src).count() === 100)
    // cloning into a non-empty root is cloneTable's own loud refusal
    val again = intercept[Exception] {
      spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE cl_src_v")
    }
    assert(again.getMessage.contains("fresh root"), again.getMessage)
  }

  test("name-addressed maintenance + DML: DESCRIBE HISTORY/DETAIL and " +
      "VACUUM by view name; MERGE/UPDATE on a saveAsTable catalog table " +
      "by name; spark.catalog lists it") {
    val root = freshRoot("named")
    docs(0, 100).write.format("graft-tx").option("statsCol", "id")
      .save(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW nm_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    val hist = spark.sql("DESCRIBE HISTORY nm_v")
    assert(hist.count() === 1)
    assert(spark.sql("DESCRIBE DETAIL nm_v").head()
      .getAs[Long]("version") === 1L)
    assert(spark.sql(
      "VACUUM nm_v RETAIN 10 VERSIONS GRACE 0 MS DRY RUN").count() === 0)
    // a catalog-NAMED table (metastore entry, graft-tx provider):
    // DML, maintenance and travel all work by name
    spark.sql("DROP TABLE IF EXISTS nmt")
    spark.sql(s"CREATE TABLE nmt USING `graft-tx` LOCATION '$root'")
    spark.sql("UPDATE nmt SET text = upper(text) WHERE id < 10")
    assert(TxLog.snapshot(spark, root)
      .where(col("text").rlike("^DOC-")).count() === 10)
    docs(100, 120).createOrReplaceTempView("nm_src")
    spark.sql("""MERGE INTO nmt t USING nm_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(TxLog.snapshot(spark, root).count() === 120)
    assert(spark.sql("DESCRIBE HISTORY nmt").count() === 3)
    assert(spark.sql("SELECT count(*) AS n FROM nmt VERSION AS OF 1")
      .head().getLong(0) === 100)
    assert(spark.catalog.tableExists("nmt"))
    spark.sql("DROP TABLE nmt")
  }

  test("ALTER on a metastore-NAMED table syncs the stored schema: reads " +
      "by name serve the new pin instead of throwing a v1 schema " +
      "mismatch") {
    val root = freshRoot("nmalter")
    spark.sql("DROP TABLE IF EXISTS nma")
    docs(0, 30).write.format("graft-tx").option("path", root)
      .option("statsCol", "id").saveAsTable("nma")
    spark.sql("ALTER TABLE nma ADD COLUMNS (lang STRING)")
    // without the metastore sync this read THROWS (v1 resolution
    // passes the stored 2-column schema back to the source and
    // refuses the mismatch) — the exact regression this test pins
    val cols = spark.table("nma").columns
    assert(cols === Array("id", "text", "lang"), cols.mkString(","))
    spark.sql("ALTER TABLE nma RENAME COLUMN text TO body")
    assert(spark.sql("SELECT body FROM nma WHERE lang IS NULL").count()
      === 30)
    spark.sql("ALTER TABLE nma DROP COLUMN lang")
    assert(spark.table("nma").columns === Array("id", "body"))
    spark.sql("DROP TABLE nma")
  }

  test("SQL CHECK constraints: ADD CONSTRAINT validates existing rows " +
      "and gates later writes; DROP CONSTRAINT lifts the gate") {
    val root = freshRoot("check")
    TxLog.append(spark, root, docs(0, 40), Some("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ck_v " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    spark.sql("ALTER TABLE ck_v ADD CONSTRAINT pos CHECK (id >= 0)")
    // an insert violating the constraint is refused in-write
    val bad = intercept[Exception] {
      TxLog.append(spark, root, Seq((-5L, "bad")).toDF("id", "text"),
        Some("id"))
    }
    assert(bad.getMessage.contains("pos"), bad.getMessage)
    // a constraint violated by EXISTING rows refuses to land
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE ck_v ADD CONSTRAINT big CHECK (id >= 30)")
    }
    assert(ex.getMessage.contains("big"), ex.getMessage)
    // drop lifts the gate
    spark.sql("ALTER TABLE ck_v DROP CONSTRAINT pos")
    TxLog.append(spark, root, Seq((-5L, "ok-now")).toDF("id", "text"),
      Some("id"))
    assert(TxLog.snapshot(spark, root).count() === 41)
  }

  test("saveAsTable round-trip: a metastore-named graft-tx table reads " +
      "back by name, appends by name, and serves travel + maintenance") {
    val root = freshRoot("sat")
    spark.sql("DROP TABLE IF EXISTS sat_t")
    docs(0, 80).write.format("graft-tx").option("path", root)
      .option("statsCol", "id").saveAsTable("sat_t")
    assert(spark.catalog.tableExists("sat_t"))
    assert(spark.table("sat_t").count() === 80)
    // append BY NAME through the writer API
    docs(80, 100).write.format("graft-tx").mode("append")
      .saveAsTable("sat_t")
    assert(TxLog.snapshot(spark, root).count() === 100)
    // name-addressed reads, travel and maintenance all work
    assert(spark.sql("SELECT count(*) AS n FROM sat_t").head().getLong(0)
      === 100)
    assert(spark.sql("SELECT count(*) AS n FROM sat_t VERSION AS OF 1")
      .head().getLong(0) === 80)
    assert(spark.sql("DESCRIBE HISTORY sat_t").count() === 2)
    spark.sql("DROP TABLE sat_t")
  }

  test("Scala-API evolution on a metastore-named table: reads by name " +
      "re-pin from the log instead of throwing on the stale catalog " +
      "schema (add, widen, rename, drop)") {
    val root = freshRoot("evoname")
    spark.sql("DROP TABLE IF EXISTS evo_t")
    docs(0, 30).write.format("graft-tx").option("path", root)
      .option("statsCol", "id").saveAsTable("evo_t")
    // evolve through the SCALA API — the metastore entry goes stale
    TxLog.evolveSchema(spark, root, "id BIGINT, text STRING, n INT")
    spark.catalog.refreshTable("evo_t") // drop any cached relation
    val cols1 = spark.table("evo_t").columns.toSeq
    assert(cols1 === Seq("id", "text", "n"),
      s"read by name must serve the evolved pin, got $cols1")
    assert(spark.sql("SELECT count(*) AS c FROM evo_t WHERE n IS NULL")
      .head().getLong(0) === 30, "old rows read as typed nulls by name")
    TxLog.renameColumn(spark, root, "text", "body")
    spark.catalog.refreshTable("evo_t")
    assert(spark.table("evo_t").columns.toSeq === Seq("id", "body", "n"))
    TxLog.dropColumn(spark, root, "n")
    spark.catalog.refreshTable("evo_t")
    assert(spark.table("evo_t").columns.toSeq === Seq("id", "body"))
    assert(spark.sql("SELECT count(*) AS c FROM evo_t").head()
      .getLong(0) === 30)
    spark.sql("DROP TABLE evo_t")
  }
}
