package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale posture (the 100 TB contract):
  *  - exact dedup is one hash-aggregate on a 128-bit digest — never a
  *    shuffle of full documents;
  *  - fuzzy dedup always goes shingle -> signature -> *band bucket
  *    join* so candidate generation is an equi-join Catalyst can plan
  *    as a shuffled hash join; the quadratic jaccard verification runs
  *    only inside buckets;
  *  - survivors are chosen with deterministic min-id rules so reruns
  *    are idempotent.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest-id row per identical value of
    * `exactOn` (byte-equal after the expression). GroupBy on a digest,
    * not the payload: at 100 TB the shuffle carries 16-byte keys. */
  def exactSurvivors(df: DataFrame, idCol: String, exactOn: Column): DataFrame = {
    val w = Window.partitionBy(md5(exactOn.cast("string"))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups: digest -> group size + surviving id. */
  def exactGroups(df: DataFrame, idCol: String, exactOn: Column): DataFrame =
    df.groupBy(md5(exactOn.cast("string")).as("digest"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("survivor_id"))

  // -------------------------------------------------------------- minhash

  /** k-permutation MinHash signature over a shingle array. Permutation
    * i is `xxhash64(i, shingle)` — one seed-indexed 64-bit hash family,
    * evaluated entirely inside codegen (no UDF). */
  def minHashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** LSH banding: split a k-long signature into `bands` bands and hash
    * each band to one 64-bit bucket key. Emits array<struct<band,bucket>>. */
  def lshBands(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(b, concat_ws(",", slice(signature, b * rows + 1, lit(rows)))).as("bucket")))
  }

  /** Candidate pairs via MinHash+LSH band buckets, verified with exact
    * shingle-set Jaccard. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, one row per surviving pair.
    *
    * Plan shape: docs -> shingles -> signature -> explode(bands) ->
    * self equi-join on (band, bucket) -> distinct pair -> verify.
    * The only shuffles are the band join and the pair distinct; both
    * key on fixed-width ints. Giant buckets (degenerate content) are
    * the skew risk at scale — cap them with `maxBucketSize`. */
  def minHashDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 8,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      TextAnalysis.shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sig = base.withColumn("bands", lshBands(minHashSignature(col("sh"), k), k, bands))
    val exploded = sig
      .select(col("id"), explode(col("bands")).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val capped = exploded
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .where(col("__n") <= maxBucketSize).drop("__n")
    val pairs = capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val withSets = pairs
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets
      .withColumn("jaccard", arrayJaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard similarity of two (already-distinct) arrays. */
  def arrayJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union > 0, inter / union.cast("double")).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * hashes. Pure column algebra — tokens are hashed once, then 64
    * static bit-aggregates fold the votes. */
  def simHash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2L - lit(1L)))
      when(vote > 0, lit(1L)).otherwise(lit(0L))
    }
    bits.zipWithIndex.map { case (bit, i) => shiftleft(bit, i) }
      .reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 16-bit quarters of the
    * fingerprint (any pair within hamming distance 3 shares at least
    * one intact quarter — pigeonhole), then verify the distance. */
  def simHashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simHash(col(textCol)).as("fp"))
    val blocked = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"),
          shiftright(col("fp"), q * 16).bitwiseAND(lit(0xFFFFL)).as("qk"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("b.q").as("q"), col("b.qk").as("qk"))
    blocked.as("l").join(blocked.as("r"),
        col("l.q") === col("r.q") && col("l.qk") === col("r.qk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming(col("l.fp"), col("r.fp")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // -------------------------------------------- n-gram Jaccard (blocked)

  /** Exact n-gram Jaccard duplicate pairs under an explicit blocking
    * predicate (e.g. same language + close length). Deterministic and
    * SQL-expressible, so it doubles as the oracle-checkable variant of
    * fuzzy dedup. The blocking predicate bounds the pair count; at
    * scale, swap in [[minHashDupPairs]] whose banding is data-driven. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, blockOn: Seq[String]): DataFrame = {
    val base = df.select(
      (col(idCol).as("id") +: TextAnalysis.shingles(col(textCol), n).as("sh") +:
        blockOn.map(col)): _*)
      .where(size(col("sh")) > 0)
    val l = base.as("l"); val r = base.as("r")
    val blockCond = blockOn.map(c => col(s"l.$c") === col(s"r.$c"))
      .foldLeft(col("l.id") < col("r.id"))(_ && _)
    l.join(r, blockCond)
      .withColumn("jaccard", arrayJaccard(col("l.sh"), col("r.sh")))
      .where(col("jaccard") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("jaccard"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs above `threshold`, blocked
    * by sign-LSH buckets from [[Similarity.hyperplaneBucket]]. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), dim, planes))
    withBucket.as("l").join(withBucket.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cosine", Similarity.cosine(col("l.v"), col("r.v")))
      .where(col("cosine") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cosine"))
  }
}
