package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the SURVEY §2.9 "UDAF surface" slot): a
  * geometric mean as an `Aggregator[Double, (sumLog, n), Double]`,
  * registered through `functions.udaf` — the supported Spark 3+/4 path
  * for user aggregates (UserDefinedAggregateFunction is removed).
  *
  * The buffer is two doubles, merged associatively, so partial
  * aggregation (map-side combine) applies exactly like a built-in agg;
  * non-positive inputs are ignored (log-domain), nulls are skipped by
  * the typed input encoder contract.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
