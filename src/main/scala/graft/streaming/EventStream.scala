package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface for the `events` table shape
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference is batch-only (@daily Airflow, SURVEY §2.8); its
  * late-data story is "re-pull 3 days + first-write-wins dedup". The
  * streaming equivalents here are the idiomatic Spark forms of exactly
  * that: watermarked `dropDuplicates` (K5's first-write-wins, bounded
  * state) and tumbling-window aggregation (the hourly-measurement
  * semantics the data already has).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked exactly-once-per-id dedup: the streaming form of the
    * reference's first-write-wins insert (K5). State is bounded by the
    * watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling-window aggregate per event type: count + sum + mean per
    * (window, event_type), emitted on watermark close. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))

  // ------------------------------------------- custom state: sessions

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Long, total_value: Double,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Streaming session state: totals accumulate as EXACT scaled
    * decimals — each value rounded to scale 10 like
    * [[sessionizeBatch]]'s `cast("decimal(38,10)")`, then summed
    * exactly — so the emitted `total_value` is bit-identical to the
    * batch twin's regardless of how events split across micro-batches
    * (a running double sum would drift with batch boundaries). */
  // public because the state Encoder's generated code must reach the
  // constructor and accessors; treat as an implementation detail
  case class SessionState(user_id: Long, n_events: Long,
      total_value: BigDecimal, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp) {
    def emit: Session =
      Session(user_id, n_events, total_value.toDouble, start_ts, end_ts)
  }

  private def dec10(v: Double): BigDecimal =
    BigDecimal(v).setScale(10, scala.math.BigDecimal.RoundingMode.HALF_UP)

  /** Session accumulator: gap-based sessionization per user via
    * `flatMapGroupsWithState` — the reference has no equivalent; this
    * is the custom-state primitive a training-data pipeline needs for
    * e.g. per-source rolling quotas. Emits a session when the
    * processing-time timeout fires. */
  def sessionize(spark: SparkSession, events: DataFrame,
      timeoutMs: Long = 30000): Dataset[Session] = {
    import spark.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(_.emit).iterator
            state.remove()
            out
          } else {
            val evs = it.toSeq
            if (evs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val start = prev.map(_.start_ts).getOrElse(evs.map(_.ts).min(Ordering.by((t: java.sql.Timestamp) => t.getTime)))
              val end = evs.map(_.ts).max(Ordering.by((t: java.sql.Timestamp) => t.getTime))
              val s = SessionState(uid,
                prev.map(_.n_events).getOrElse(0L) + evs.size,
                prev.map(_.total_value).getOrElse(BigDecimal(0)) +
                  evs.map(e => dec10(e.value)).sum,
                start, end)
              state.update(s)
              state.setTimeoutDuration(timeoutMs)
              Iterator.empty
            }
          }
      }
  }

  /** Batch-mode equivalent of [[windowedAgg]] (same expression tree on
    * a bounded frame) — used by the correctness oracle. */
  def windowedAggBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))

  /** Batch gap-based sessionization (the deterministic, oracle-checkable
    * twin of [[sessionize]]): a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Classic
    * lag -> boundary flag -> running sum; two windows over ONE
    * partitioning (user_id), so a single shuffle. Session ids are
    * (user_id, session_seq) — globally unique without any driver-side
    * counter, which is what survives 100 TB. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(byUser)
    val isNew = when(prev.isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(prev) > gapSeconds, 1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        // exact decimal sum -> double: deterministic under any
        // partial-aggregation order (a plain double sum is not).
        // Scale 10 so the per-value rounding is far below double
        // measurement noise (scale 2 would half-up every value to
        // cents before summing); the streaming sessionizer accumulates
        // in the SAME scaled-decimal space so batch and stream agree.
        sum(col("value").cast("decimal(38,10)")).cast("double").as("total_value"),
        min("ts").as("start_ts"), max("ts").as("end_ts"))
  }
}
