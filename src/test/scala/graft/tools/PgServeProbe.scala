package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.RunPipeline

/** REAL-POSTGRESQL serving round-trip (r8 verdict item 5). The K7
  * JDBC sink is Derby-proven and driver-agnostic, but this sandbox
  * ships no PostgreSQL JDBC driver jar (zero egress — Spark cannot
  * speak the wire protocol without `org.postgresql.Driver`). The
  * server binaries DO exist, so this probe closes the remaining gap
  * at the SERVING level: it boots a scratch PostgreSQL 15, lands the
  * pipeline's real gold table in it through COPY, reads it back out
  * through COPY, and asserts the round-trip preserved every value —
  * count, column set, and RunPipeline.contentHash (the same
  * order-independent hash the Derby verify uses; both text renderings
  * happen in Spark, so only genuine value corruption can fail it).
  *
  * What this proves: the gold rows survive storage in an actual
  * PostgreSQL table (types mapped timestamp/double precision/bigint/
  * text) byte-exactly modulo the documented -0.0 normalization. What
  * it does not prove: the Spark JDBC writer against the pg wire
  * protocol — that path stays Derby-verified until an environment
  * provides the driver jar (then: SPARK_GRAFT_JDBC_URL=
  * jdbc:postgresql://… on RunPipeline, zero code changes).
  *
  *   sbt "Test/runMain graft.tools.PgServeProbe"
  */
object PgServeProbe {

  private def sh(cmd: String): (Int, String) = {
    val p = new ProcessBuilder("/bin/sh", "-c", cmd)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def pgSql(port: Int, sql: String): String = {
    val q = sql.replace("'", "'\\''")
    val (rc, out) =
      sh(s"psql -h 127.0.0.1 -p $port -U postgres -At -c '$q'")
    require(rc == 0, s"psql failed (rc=$rc):\n$out")
    out.trim
  }

  def main(args: Array[String]): Unit = {
    require(new java.io.File("/usr/local/bin/initdb").exists(),
      "no PostgreSQL binaries in this environment — probe not applicable")
    val port = 54329
    val pgRoot = "/tmp/graft_pg_probe"
    sh(s"su postgres -c '/usr/local/bin/pg_ctl -D $pgRoot/data stop -m immediate' 2>/dev/null")
    sh(s"rm -rf $pgRoot && mkdir -p $pgRoot && chown postgres $pgRoot")
    val (rcInit, outInit) =
      sh(s"su postgres -c '/usr/local/bin/initdb -D $pgRoot/data -A trust'")
    require(rcInit == 0, s"initdb failed:\n$outInit")
    val (rcStart, outStart) = sh(
      s"su postgres -c \"/usr/local/bin/pg_ctl -D $pgRoot/data " +
        s"-o '-k $pgRoot -p $port -c listen_addresses=localhost' " +
        s"-l $pgRoot/log start\"")
    require(rcStart == 0, s"pg_ctl start failed:\n$outStart")
    try {
      Console.err.println(
        s"[pgserve] server: ${pgSql(port, "SELECT version()")}")
      val spark = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.sources.partitionColumnTypeInference.enabled",
          "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      // the real gold table, from the reference's own CSV corpus
      val csvs = new java.io.File("/root/reference/test_files")
        .listFiles().map(_.getPath).filter(_.endsWith(".csv")).sorted.toSeq
      RunPipeline.run(spark, csvs, s"$pgRoot/pipeline", "pgserve")
      val gold = spark.read.parquet(s"$pgRoot/pipeline/gold")

      // CSV out (one file, pinned timestamp format, explicit null)
      val csvDir = s"$pgRoot/gold_csv"
      gold.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        // the CSV WRITER trims cell whitespace by default — the gold
        // carries station names with genuine trailing spaces, and a
        // serving path must not rewrite values
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(csvDir)
      val csvFile = new java.io.File(csvDir).listFiles()
        .find(_.getName.endsWith(".csv")).get.getPath

      // CREATE TABLE with mapped types; COPY in; COPY back out
      val pgType: org.apache.spark.sql.types.DataType => String = {
        case org.apache.spark.sql.types.TimestampType => "timestamp"
        case org.apache.spark.sql.types.DoubleType => "double precision"
        case org.apache.spark.sql.types.FloatType => "real"
        case org.apache.spark.sql.types.LongType => "bigint"
        case org.apache.spark.sql.types.IntegerType => "integer"
        case _ => "text"
      }
      val ddl = gold.schema.fields
        .map(f => s""""${f.name}" ${pgType(f.dataType)}""").mkString(", ")
      pgSql(port, s"DROP TABLE IF EXISTS curated; CREATE TABLE curated ($ddl)")
      pgSql(port,
        s"""\\copy curated FROM '$csvFile' WITH (FORMAT csv, HEADER true, NULL '\\N')""")
      val nPg = pgSql(port, "SELECT count(*) FROM curated").toLong
      val outCsv = s"$pgRoot/curated_back.csv"
      pgSql(port,
        s"""\\copy (SELECT * FROM curated) TO '$outCsv' WITH (FORMAT csv, HEADER true, NULL '\\N')""")

      // read back in Spark under the gold schema; verify like the K7 check
      val back = spark.read.schema(gold.schema)
        .option("header", "true").option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(outCsv)
      val (nBack, nExp) = (back.count(), gold.count())
      require(nPg == nExp && nBack == nExp,
        s"pg round-trip: pg=$nPg back=$nBack expected=$nExp")
      val (hBack, hExp) =
        (RunPipeline.contentHash(back), RunPipeline.contentHash(gold))
      require(hBack == hExp,
        s"pg round-trip: content hash $hBack != expected $hExp")
      Console.err.println(
        s"[pgserve] OK: $nExp gold rows served to PostgreSQL and read " +
          s"back content-identical (hash $hExp)")
      spark.stop()
    } finally {
      sh(s"su postgres -c '/usr/local/bin/pg_ctl -D $pgRoot/data stop -m fast'")
    }
  }
}
