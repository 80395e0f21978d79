package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: left rows with a point column
  * against right rows with [start, end] intervals.
  *
  * The naive form is a non-equi theta join — Catalyst can only plan it
  * as BroadcastNestedLoopJoin (or a cartesian), which is quadratic and
  * the single most common 100 TB blow-up. The scalable shape is
  * BUCKETIZATION: quantize time into `bucketWidth`-sized cells, explode
  * each interval into the cells it covers, and equi-join on the cell
  * id before applying the exact containment predicate. Cost is
  * O(|L| + |R| * avgIntervalCells) shuffled on a fixed-width key —
  * a shuffled hash join Catalyst plans like any other equi-join.
  * `bucketWidth` tuning: ~the median interval length, so intervals
  * explode into a handful of cells and points probe exactly one.
  */
object RangeJoin {

  /** Inner range join: `left.pointCol` in `[right.startCol, right.endCol]`
    * (inclusive). Columns must be numeric (cast timestamps to epoch
    * seconds upstream). */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    def cell(c: Column): Column = floor(c / bucketWidth).cast("long")
    val l = left.withColumn("__cell", cell(col(pointCol)))
    val r = right.withColumn("__cell",
      explode(sequence(cell(col(startCol)), cell(col(endCol)))))
    l.join(r, Seq("__cell"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }
}
