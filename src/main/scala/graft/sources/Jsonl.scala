package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto interchange format of
  * training-data pipelines (corpus drops, eval sets, annotation
  * exports all ship as `.jsonl[.gz]`). Thin on purpose: the value is
  * the CONTRACT, not the plumbing.
  *
  *  - [[write]] emits one JSON object per row, partition-parallel
  *    (one file per task, like any lake write); pass a codec for
  *    `.jsonl.gz` interchange.
  *  - [[read]] requires an EXPLICIT schema: schema inference is a
  *    whole extra pass over the data at 100 TB, and it guesses types
  *    (longs that look like doubles, strings that look like dates) —
  *    an interchange boundary is exactly where silent type drift
  *    hurts most. `mode=FAILFAST` so a malformed line fails the job
  *    instead of becoming a silent null row.
  *
  * Fidelity fine print (x51 proves the exact part): integral types,
  * strings (full escaping), booleans, arrays and structs round-trip
  * exactly; floats/doubles round-trip via Jackson's shortest
  * representation (bit-exact for values that came from a parse, but
  * treat float columns crossing a jsonl boundary as
  * precision-sensitive); timestamps serialize with `timestampFormat`
  * (ISO-8601 here) and binary becomes base64 — both are CONVERSIONS,
  * not identities, so hash-compared pipelines should keep those
  * columns in parquet or normalize after read. */
object Jsonl {

  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .option("mode", "FAILFAST")
      .json(path)
}
