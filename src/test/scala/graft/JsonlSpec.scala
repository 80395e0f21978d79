package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._

/** The jsonl interchange contract beyond x51's round-trip oracle:
  * FAILFAST on malformed lines (an interchange boundary must not turn
  * garbage into silent null rows) and codec round-trip. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("gzip jsonl round-trips and malformed lines fail fast") {
    val docs = Seq((1L, "plain text"), (2L, "quotes \" and\nnewlines \\ too"),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toString
    Jsonl.write(docs, s"$tmp/gz", codec = Some("gzip"))
    assert(new java.io.File(s"$tmp/gz").listFiles()
      .exists(_.getName.endsWith(".json.gz")), "gzip codec must reach the files")
    val back = Jsonl.read(spark, s"$tmp/gz", docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0,
      "escaped strings and nulls must round-trip through gzip jsonl")

    // FAILFAST: a malformed line is an error, not a null row
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "bad.jsonl"),
      """{"doc_id": 1, "text": "ok"}""" + "\n" + "{not json at all\n")
    val e = intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, s"$tmp/bad.jsonl", docs.schema).collect()
    }
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      e.getCause != null, s"expected a malformed-record failure, got $e")
  }
}
