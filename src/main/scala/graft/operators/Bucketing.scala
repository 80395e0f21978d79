package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed lake tables: the storage-side contract that makes the big
  * fact-to-fact joins shuffle-free.
  *
  * At 100 TB the dominant cost of `lineitem JOIN orders` is shuffling
  * both sides on the key. Writing both tables bucketed (and sorted)
  * by that key moves the shuffle to write time, ONCE, after which
  * every equi-join / groupBy on the key plans with zero Exchange:
  * Spark's native bucketing (hash(key) mod buckets, hive-compatible
  * layout not required) lets SortMergeJoin consume the buckets
  * directly. The same contract backs the silver tables'
  * (code_site, date_de_debut) layout in SURVEY §7.
  *
  * Bucket-count discipline at scale: pick `buckets` so one bucket of
  * the LARGER table is a few hundred MB (fits an executor core's
  * working set); both join sides must use the same count, or one side
  * is coalesced/re-shuffled.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. With both
    * sides bucketed on `keys` with equal bucket counts, the physical
    * plan contains no Exchange (verify via `.explain`). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
