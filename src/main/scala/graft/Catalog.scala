package graft

import graft.operators.{AsOfJoin, Audio, Bpe, Curate, Dedup, IvfAnn, Kmv, Multimodal, Pca, Pq, RangeJoin, Sampling, Similarity, SkewJoin, Snapshot, TableProfile, TextAnalysis, TxLog, Urls, ZOrder}
import graft.pipeline.AirQuality
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One declared query per implemented operator — see the part files:
  * [[CatalogPipeline]] (q01-q40), [[CatalogCorpusA]]/[[CatalogCorpusB]]
  * (corpus curation extensions), [[CatalogAnalytics]] (TPC-H q41-q61 +
  * ANN/media/containers), [[CatalogTx]] (layout audits + transactional
  * tables + learned filters). Shared fragments live in
  * [[CatalogShared]]. The conventions that make the driver's
  * hash-compare deterministic (ORDER BY on a unique column set on both
  * sides, DECIMAL(18,4) money sums, rounded doubles, formatted
  * timestamps) are documented on the part files' QueryDefs.
  */
/** One declared query: the Spark plan builder, the equivalent ANSI SQL
  * the driver replays in DuckDB (None => rows-only check), and whether
  * Bench times it. Top level so the Catalog parts construct it without
  * touching the (part-concatenating) [[Catalog]] object during their
  * own initialization. */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Catalog {

  /** The historical `Catalog.QueryDef` surface (Bench and the probes
    * name the type through here). */
  type QueryDef = graft.QueryDef
  val QueryDef = graft.QueryDef

  /** q08's one-pass lake-materialized variant — public because
    * BucketingSpec plan-audits it. Implementation in
    * [[CatalogShared]]. */
  def goldJoinFromMaterializedBase(s: SparkSession, d: String,
      basePath: String): DataFrame =
    CatalogShared.goldJoinFromMaterializedBase(s, d, basePath)

  /** Every declared query, in the original single-file order. */
  val entries: Seq[QueryDef] =
    CatalogPipeline.defs ++ CatalogCorpusA.defs ++ CatalogCorpusB.defs ++
      CatalogAnalytics.defs ++ CatalogTx.defs

  /** name -> builder, for SparkEntry.queries. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => e.name -> e.build).toMap

  /** name -> DuckDB SQL, for SparkEntry.oracleSql. */
  lazy val oracleSql: Map[String, String] =
    entries.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap

  /** headline queries for Bench. */
  lazy val headlines: Seq[QueryDef] = entries.filter(_.headline)
}

