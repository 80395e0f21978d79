package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build time (the idiomatic deployment);
  *  - [[GraftFunctions.ensureRegistered]] at first use, for sessions
  *    we do not construct (the harness driver owns its own session).
  *    Registration into the session's FunctionRegistry is idempotent.
  */
object GraftFunctions {

  /** Resolve a SQL argument that must be a literal int (e.g. the `n`
    * in `shingle_hashes(toks, 3)`): check foldability BEFORE eval (a
    * non-foldable arg would otherwise throw an opaque
    * UnsupportedOperationException from eval), and validate the Long
    * range BEFORE narrowing (4294967297 must be rejected, not silently
    * truncated to 1). */
  private def literalInt(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn $arg must be an integer literal, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$fn $arg is out of integer range: $l")
      case other => throw new IllegalArgumentException(
        s"$fn $arg must be an integer literal, got $other")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("unaccent"),
      new ExpressionInfo(classOf[Unaccent].getName, "unaccent"),
      (children: Seq[Expression]) => Unaccent(children.head)),
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))),
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head,
        literalInt("shingle_hashes", "n", children(1)))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head,
        literalInt("minhash_sig", "k", children(1)))),
    (FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (children: Seq[Expression]) => HyperplaneBucket(children.head,
        literalInt("hyperplane_bucket", "dim", children(1)),
        literalInt("hyperplane_bucket", "planes", children(2)))),
    (FunctionIdentifier("sorted_pairs"),
      new ExpressionInfo(classOf[SortedPairs].getName, "sorted_pairs"),
      (children: Seq[Expression]) => SortedPairs(children.head)),
    (FunctionIdentifier("top_k_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "top_k_pairs"),
      (children: Seq[Expression]) => TopKPairs(children(0), children(1),
        literalInt("top_k_pairs", "k", children(2)))),
    (FunctionIdentifier("capped_ids"),
      new ExpressionInfo(classOf[CappedIds].getName, "capped_ids"),
      (children: Seq[Expression]) => CappedIds(children.head,
        literalInt("capped_ids", "limit", children(1)))),
    (FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
      (children: Seq[Expression]) => Int8Quantize(children.head)),
    (FunctionIdentifier("int8_dot"),
      new ExpressionInfo(classOf[Int8Dot].getName, "int8_dot"),
      (children: Seq[Expression]) => Int8Dot(children(0), children(1))))

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
