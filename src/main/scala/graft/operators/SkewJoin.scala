package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * already splits oversized sort-merge partitions at runtime, and is
  * the first line of defense at scale. Salting is the explicit,
  * planner-independent fallback for the pathological case AQE can't
  * fix: ONE join key so hot that a single key's rows exceed an
  * executor (e.g. the empty-string user id owning 5% of 100 TB).
  *
  * Mechanics: the skewed (fact) side gets a uniform random-ish salt in
  * [0, buckets) derived deterministically from a unique column (so
  * reruns are stable); the small (dim) side is replicated `buckets`
  * times via explode. The join key becomes (key, salt): each hot key
  * now spreads over `buckets` reducers. Correctness is unchanged —
  * every fact row still meets every matching dim row exactly once.
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `keys`, salted `buckets`
    * ways. `saltSource` must be a column of `fact` (ideally unique —
    * only uniformity matters, not uniqueness). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSource: String, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
