package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most
  * recent right row with the same key and `rightTime <= leftTime`.
  *
  * Implementation is the *union + last-ignore-nulls window* technique,
  * not a range cross-join: both sides are tagged and unioned, then one
  * window per key (ordered by time, right-before-left on ties) carries
  * the latest right payload forward onto each left row.
  *
  * Scale: a single shuffle on the key, window state is one payload
  * struct per partition cursor — no quadratic candidate explosion, no
  * per-key collect. This is the shape that survives 100 TB; a custom
  * SparkPlan would only save the tag/filter overhead.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c)).toSeq

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .withColumn("__rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayloadCols.map(col): _*).schema.fields)))
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__isLeft", lit(0))
      .withColumn("__rpay", struct(rightPayloadCols.map(col): _*))
      .select((keys.map(col) :+ col("__t") :+ col("__isLeft") :+ col("__rpay")): _*)

    val leftShaped = taggedLeft.select(
      (keys.map(col) :+ col("__t") :+ col("__isLeft") :+ col("__rpay")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val rightShaped = leftCols.filterNot(keys.contains)
      .foldLeft(taggedRight)((df, c) => df.withColumn(s"__l_$c", lit(null).cast(
        left.schema(c).dataType)))
      .select(leftShaped.columns.map(col).toIndexedSeq: _*)

    val unioned = leftShaped.unionByName(rightShaped)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned.withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))

    val out = matched.where(col("__isLeft") === 1).select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightPayloadCols.map(c => col("__m").getField(c).as(c)): _*)
    out
  }
}
