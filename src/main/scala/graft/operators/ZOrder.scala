package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) CLUSTERING for multi-dimensional data
  * skipping — the lake `OPTIMIZE ZORDER BY` re-expressed as plain
  * column algebra. A table range-clustered on ONE key prunes scans on
  * that key only: a file's (min, max) stats on the second dimension
  * cover its whole domain, so a two-dimensional box query still reads
  * every file the first dimension admits. Interleaving the bits of
  * both keys (Morton 1966) makes each contiguous z-range a compact
  * rectangle-ish region of the plane, so per-file min/max stats prune
  * on BOTH dimensions at once.
  *
  * Everything here is exact integer algebra over codegen'd builtins
  * (shift/mask/or — no UDF, no custom expression needed), so the
  * curve value, the bucketing, and the skipping measurement all
  * replay bit-for-bit in any SQL engine (the x122 oracle does).
  *
  * Scale shape: [[interleave16]] is map-only; [[cluster]] is ONE
  * range-partition shuffle + an in-partition sort (exactly what a
  * sorted write costs on any key); [[skippingAudit]] is two hash aggs
  * over (bucket) — the measurement a layout decision reads BEFORE
  * committing a 100 TB rewrite.
  */
object ZOrder {

  /** The Morton code of two non-negative dimensions clamped to 16
    * bits: bit i of `x` lands at bit 2i, bit i of `y` at bit 2i+1.
    * 32 shift/mask/or terms, all inside whole-stage codegen. */
  def interleave16(x: Column, y: Column): Column = {
    val xs = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ys = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Re-cluster `df` on the z-order of two integer dimensions: one
    * range-partition shuffle on the curve value + an in-partition
    * sort, so partition (→ file) boundaries cut the curve into
    * disjoint runs. Written with per-file min/max stats, a box query
    * on EITHER OR BOTH dims prunes files. */
  def cluster(df: DataFrame, xCol: Column, yCol: Column,
      partitions: Int): DataFrame = {
    require(partitions > 0, s"ZOrder.cluster: partitions=$partitions")
    df.withColumn("__z", interleave16(xCol, yCol))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** MEASURED data-skipping audit — run it before committing a
    * layout rewrite: model the table as fixed-width z-prefix buckets
    * (`z div 2^shift`, a deterministic stand-in for range-clustered
    * files) vs single-dimension stripes (`x div 2^linShift`, the
    * plain sorted layout with the same bucket granularity), compute
    * every bucket's (min, max) on both dims — exactly the stats a
    * parquet footer carries — and count the buckets a box query
    * [xLo, xHi] × [yLo, yHi] cannot prune. One row per layout:
    * (layout, n_buckets, n_read, read_ppm). */
  def skippingAudit(df: DataFrame, xCol: Column, yCol: Column,
      zShift: Int, linShift: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    def layoutStats(bucket: Column, layout: String): DataFrame =
      base.withColumn("b", bucket)
        .groupBy("b")
        .agg(min("x").as("minx"), max("x").as("maxx"),
          min("y").as("miny"), max("y").as("maxy"))
        .agg(count(lit(1)).as("n_buckets"),
          coalesce(sum(when(
              col("minx") <= xHi && col("maxx") >= xLo &&
              col("miny") <= yHi && col("maxy") >= yLo, 1L)
            .otherwise(0L)), lit(0L)).as("n_read"))
        .select(lit(layout).as("layout"), col("n_buckets"), col("n_read"),
          expr("(n_read * CAST(1000000 AS BIGINT)) DIV n_buckets")
            .as("read_ppm"))
    layoutStats(shiftright(interleave16(col("x"), col("y")), zShift), "zorder")
      .unionByName(layoutStats(shiftright(col("x"), linShift), "linear"))
  }
}
