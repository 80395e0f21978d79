package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** The two `private[sql]` doors graft's SQL-DML and streaming-source
  * surfaces need, reached the sanctioned Scala way (a subpackage of
  * `org.apache.spark.sql` — the same move every public Spark
  * connector that predates a public API used; nothing here touches
  * behavior, both are one-line delegations):
  *
  *  - [[ofRows]]: turn an analyzed [[LogicalPlan]] back into a
  *    [[DataFrame]] — the SQL `MERGE INTO`/`UPDATE`/`DELETE` rule
  *    ([[graft.sources.TxSparkExtensions]]) captures the resolved
  *    source/target plans and must hand them to the
  *    [[graft.operators.TxLog]] write paths as frames.
  *  - [[streamingDataFrame]]: wrap an [[InternalRow]] RDD as a
  *    STREAMING-tagged frame — a DSv1 streaming `Source.getBatch`
  *    must return `isStreaming = true` plans
  *    (MicroBatchExecution asserts it), and the `graft-tx` source
  *    builds each micro-batch from a full [[DataFrame]] pipeline
  *    (changes() with masks/alignment/clone resolution) whose lazy
  *    `toRdd` this re-tags without materializing anything. */
object Shims {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse re-tag for a DSv1 streaming SINK: `Sink.addBatch`
    * receives a STREAMING-tagged frame (an IncrementalExecution), and
    * handing it to batch write paths needs the isStreaming flag
    * dropped over the already-planned RDD — the exact move Spark's
    * own ForeachBatchSink makes. Nothing materializes here. */
  def batchDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
