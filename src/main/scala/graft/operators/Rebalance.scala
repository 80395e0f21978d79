package graft.operators

import org.apache.spark.sql.DataFrame

/** Ensure a DataFrame has at least `spark.default.parallelism`
  * partitions before a compute-bound per-row stage.
  *
  * Why: a single parquet file with one row group plans as ONE input
  * split, so every downstream narrow transform (tokenize, hash, vector
  * math) runs on one core no matter how many executors exist. At real
  * scale (100 TB = tens of thousands of splits) this is a no-op — the
  * guard checks the planned partition count first, so well-split inputs
  * are never shuffled.
  */
object Rebalance {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
