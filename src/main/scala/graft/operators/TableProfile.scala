package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics — the lakehouse housekeeping op that
  * feeds every planning decision made OUTSIDE Catalyst's own CBO:
  * broadcast-vs-shuffle calls (`ndv` + row counts bound join output),
  * salting decisions ([[SkewJoin.heavyKeys]] is the per-value deep
  * dive; this is the summary), null-handling audits, and partition
  * layout choices.
  *
  * Shape: ONE pass over the table — a single wide aggregate carrying,
  * per profiled column, (non-null count, exact distinct count, min,
  * max) plus the table row count, then an unpivot of the 1-row result
  * into one row per column. Catalyst plans the multi-distinct via
  * Expand (k+1 streams over one scan, one shuffle) — the standard
  * exact-NDV shape; at 100 TB swap `exact = false` to
  * `approx_count_distinct` (HLL sketch, no Expand) and the pass is
  * agg-light. min/max emit as canonical strings so the profile row is
  * schema-stable across column types (callers needing typed bounds
  * read the source column; profiled columns here should avoid
  * float/timestamp when exact external replay matters — their string
  * forms are engine-specific).
  *
  * Output: (col_name, n_rows, n_nulls, ndv, min_val, max_val),
  * one row per requested column, ordered by col_name. */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "TableProfile.profile: need at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"TableProfile.profile: no column '$c' in ${df.columns.mkString(",")}"))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __n, __n - __cnt_$c, __ndv_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_rows, n_nulls, ndv, min_val, max_val)")
      .orderBy("col_name")
  }
}
