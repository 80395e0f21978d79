package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing primitives.
  *
  * Spark's `xxhash64` is fast but engine-specific: no external system
  * can replay it, so every operator built on it is condemned to
  * rows-only verification. These primitives trade a little speed for
  * exact replayability by ANY engine with `md5` and 64-bit integer
  * arithmetic (DuckDB, Trino, Postgres, ...):
  *
  *  - [[md5Hash60]] here == `CAST('0x' || substring(md5(s), 1, 15) AS
  *    BIGINT)` in DuckDB — a 60-bit positive hash;
  *  - [[perm]] is a plain affine family over the Mersenne prime
  *    2^31 - 1, all intermediate products < 2^62 so the arithmetic is
  *    overflow-free (identical under ANSI and legacy modes).
  *
  * Hot paths that never need external verification can keep
  * `xxhash64`; the dedup/similarity operators default to these so
  * their results are auditable end to end.
  */
object PortableHash {

  /** 60-bit positive string hash: first 15 hex chars of md5. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Mersenne prime 2^31 - 1 — the modulus of the MinHash family. */
  val MinHashP = 2147483647L

  /** Multiplier of the i-th affine permutation (nonzero mod P). */
  def permA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % (MinHashP - 1) + 1

  /** Offset of the i-th affine permutation. */
  def permB(i: Int): Long = (69069L * (i + 1) + 1234567L) % MinHashP

  /** The i-th MinHash permutation of a 60-bit hash:
    * `(a_i * (h mod P) + b_i) mod P`. */
  def perm(i: Int, h: Column): Column =
    (lit(permA(i)) * (h % lit(MinHashP)) + lit(permB(i))) % lit(MinHashP)
}
