package graft.sources

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGe, LessThan => CLt, LessThanOrEqual => CLe, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.graftshim.Shims

import graft.operators.TxLog

/** SQL ROW-LEVEL DML for `graft-tx` tables — `MERGE INTO`, `UPDATE`
  * and `DELETE` from pure SQL, lowered onto the engine's PRUNED write
  * paths (the first thing a Delta-habituated SQL user types is
  * `MERGE INTO`; r14 verdict item 3). Activation is the standard
  * extensions hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sources.TxSparkExtensions")
  *   // MERGE INTO t USING s ON t.k = s.k
  *   //   WHEN MATCHED THEN UPDATE SET *
  *   //   WHEN NOT MATCHED THEN INSERT *        -> TxLog.merge
  *   // MERGE ... WHEN MATCHED THEN DELETE      -> TxLog.mergeDelete
  *   // UPDATE t SET c = e, ... WHERE p         -> TxLog.updateWhere
  *   // DELETE FROM t WHERE p                   -> TxLog.deleteWhere
  * }}}
  *
  * The rule pattern-matches the ANALYZED plans (the published
  * Delta-on-Spark move: an injected resolution rule replaces the
  * row-level plan with a runnable command before the v2-only check
  * rejects it) and refuses anything it cannot lower EXACTLY — merge
  * shapes beyond upsert/delete-on-match, non-equi merge conditions,
  * conditional clauses — with the supported forms named in the
  * error: a SQL door that silently approximated MERGE semantics
  * would be worse than none. UPDATE/DELETE predicates additionally
  * compile to manifest bounds ([[TxBounds]]' conjunctive-long rule
  * applied at the Expression level), so a `WHERE id >= a AND id < b`
  * rewrites only the dirs whose recorded stats admit `[a, b)` — the
  * same write-path pruning the Scala API gets, from plain SQL.
  * Reference anchor: the reference's K5 first-write-wins staging
  * (src/preprocess_to_staging.py:133-146) IS the upsert a SQL user
  * writes as MERGE. */
class TxSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new TxDmlRule(spark))
    // the maintenance/DDL statements (DESCRIBE HISTORY/DETAIL, VACUUM,
    // ALTER TABLE, OPTIMIZE, RESTORE) and read-side time travel — see
    // [[GraftSqlParser]]; everything else delegates verbatim
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
  }
}

/** The analyzed tx-table target: unwraps aliases down to the
  * [[TxRelation]] and yields its root. Travel reads are refused —
  * DML on the past is a contradiction. */
private[graft] object TxTarget {
  def unapply(plan: LogicalPlan): Option[String] = plan match {
    case s: SubqueryAlias => unapply(s.child)
    case v: View => unapply(v.child)
    case lr: LogicalRelation => lr.relation match {
      case r: TxRelation =>
        require(!r.isTravel,
          "graft-tx DML: the target is a versionAsOf/timestampAsOf " +
            "travel read — DML applies to the head, not the past")
        Some(r.tableRoot)
      case _ => None
    }
    case _ => None
  }
}

private[graft] class TxDmlRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case m @ MergeIntoTable(TxTarget(root), source, _, _, _, _, _)
          if m.resolved =>
        lowerMerge(root, m, source)
      case u @ UpdateTable(t @ TxTarget(root), assignments, condition)
          if u.resolved =>
        GraftUpdateCommand(root, assignments.map(a =>
            (attrName(a.key, "UPDATE SET target"), bareSql(a.value))),
          condition.map(bareSql), condition.map(boundsOf).getOrElse(Seq.empty))
      case d @ DeleteFromTable(TxTarget(root), condition)
          if d.resolved =>
        GraftDeleteCommand(root, bareSql(condition), boundsOf(condition))
    }

  /** Render a resolved expression as SQL with attribute QUALIFIERS
    * stripped (`t.id` → `id`): the text re-resolves by name against
    * the touched-dir frame, which carries the pin's bare columns.
    * Refusal-first: expressions that cannot survive the text
    * round-trip are REJECTED HERE with the supported shapes named —
    * scalar/IN subqueries render as `scalarsubquery()` (an opaque
    * parse error at apply time), and nondeterministic functions
    * (rand(), uuid()) would RE-EVALUATE at apply time, possibly per
    * conflict retry, silently changing what the statement wrote. */
  private def bareSql(e: Expression): String = {
    e.foreach {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw new UnsupportedOperationException(
          "graft-tx DML: subqueries in UPDATE/DELETE/MERGE conditions " +
            "or assignments are not lowered — supported shapes are " +
            "column/literal/function expressions over the target's own " +
            "columns; stage the subquery's result and MERGE it, or use " +
            "the Scala API")
      case nd if !nd.deterministic &&
          nd.children.forall(_.deterministic) =>
        throw new UnsupportedOperationException(
          s"graft-tx DML: nondeterministic expression ${nd.prettyName}() " +
            "in a condition or assignment is not lowered — it would " +
            "re-evaluate at apply time (and per conflict retry), so the " +
            "committed rows could differ from what the statement read; " +
            "compute the value first and pass it as a literal")
      // a resolved lambda renders as `lambdafunction(namedlambdavariable()
      // ...)` — un-reparseable text that would fail at apply time with
      // an opaque parse error; refuse at the rule with the shape named
      case hof: org.apache.spark.sql.catalyst.expressions
          .HigherOrderFunction =>
        throw new UnsupportedOperationException(
          s"graft-tx DML: higher-order function ${hof.prettyName}() " +
            "(lambda) in a condition or assignment is not lowered — " +
            "resolved lambdas do not round-trip as SQL text; stage the " +
            "computed column and MERGE it, or use the Scala API " +
            "(TxLog.updateWhere takes any Column)")
      case _ =>
    }
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
  }

  private def attrName(e: Expression, what: String): String = e match {
    case a: Attribute => a.name
    case other => throw new UnsupportedOperationException(
      s"graft-tx DML: $what must be a plain column, got ${other.sql}")
  }

  /** The per-column `[lo, hi)` intervals a predicate IMPLIES — the
    * [[TxBounds.boundsFrom]] translation applied to the analyzed
    * Expression (conjunctions of long-integral comparisons on plain
    * columns; everything else contributes no bound, which only costs
    * I/O — [[TxLog.deleteWhere]] re-applies the full predicate). */
  private def boundsOf(e: Expression): Seq[(String, Long, Long)] = {
    val lo = scala.collection.mutable.Map.empty[String, Long]
    val hi = scala.collection.mutable.Map.empty[String, Long]
    def tighten(m: scala.collection.mutable.Map[String, Long], c: String,
        v: Long, keepMax: Boolean): Unit =
      m.update(c, m.get(c) match {
        case Some(prev) =>
          if (keepMax) math.max(prev, v) else math.min(prev, v)
        case None => v
      })
    // a FOLDABLE integral side (the analyzer wraps SQL literals in
    // casts — `id >= 100` arrives as `id >= CAST(100 AS BIGINT)`)
    def longOf(e: Expression): Option[Long] =
      if (!e.foldable) None
      else e.dataType match {
        case _: org.apache.spark.sql.types.ByteType |
             _: org.apache.spark.sql.types.ShortType |
             _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.LongType =>
          Option(e.eval(null)).map {
            case i: java.lang.Integer => i.longValue
            case l2: java.lang.Long => l2.longValue
            case s: java.lang.Short => s.longValue
            case b: java.lang.Byte => b.longValue
          }
        case _ => None
      }
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.ByteType |
             _: org.apache.spark.sql.types.ShortType |
             _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.LongType => true
        case _ => false
      }
    // the analyzer wraps the ATTRIBUTE side in type-coercion casts
    // (`cast(id AS BIGINT) IN (…)`); an integral UP-cast never
    // changes ordering or equality, so bounds on the underlying
    // column stay sound — anything narrower contributes no bound
    object BoundAttr {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference => Some(a)
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          c.child match {
            case a: AttributeReference
                if integral(a.dataType) && integral(c.dataType) &&
                  org.apache.spark.sql.catalyst.expressions.Cast
                    .canUpCast(a.dataType, c.dataType) => Some(a)
            case _ => None
          }
        case _ => None
      }
    }
    def walk(ex: Expression): Unit = ex match {
      case CEq(BoundAttr(a), l) => longOf(l).foreach { v =>
        tighten(lo, a.name, v, keepMax = true)
        if (v != Long.MaxValue) tighten(hi, a.name, v + 1, keepMax = false)
      }
      case CEq(l, BoundAttr(a)) if longOf(l).isDefined =>
        walk(CEq(a, l))
      case CGt(BoundAttr(a), l) => longOf(l).foreach(v =>
        if (v != Long.MaxValue) tighten(lo, a.name, v + 1, keepMax = true))
      case CGe(BoundAttr(a), l) => longOf(l).foreach(v =>
        tighten(lo, a.name, v, keepMax = true))
      case CLt(BoundAttr(a), l) => longOf(l).foreach(v =>
        tighten(hi, a.name, v, keepMax = false))
      case CLe(BoundAttr(a), l) => longOf(l).foreach(v =>
        if (v != Long.MaxValue) tighten(hi, a.name, v + 1, keepMax = false))
      case CGt(l, BoundAttr(a)) => walk(CLt(a, l))
      case CGe(l, BoundAttr(a)) => walk(CLe(a, l))
      case CLt(l, BoundAttr(a)) => walk(CGt(a, l))
      case CLe(l, BoundAttr(a)) => walk(CGe(a, l))
      // an IN list implies the span [min, max] of its members — a
      // takedown's `WHERE id IN (…)` prunes like a range
      case org.apache.spark.sql.catalyst.expressions.In(
          BoundAttr(a), vs) if vs.nonEmpty =>
        val ls = vs.map(longOf)
        if (ls.forall(_.isDefined)) {
          val longs = ls.flatten
          tighten(lo, a.name, longs.min, keepMax = true)
          if (longs.max != Long.MaxValue)
            tighten(hi, a.name, longs.max + 1, keepMax = false)
        }
      case CAnd(x, y) => walk(x); walk(y)
      case _ => // OR trees, functions, non-integral types: no bound
    }
    walk(e)
    val cols = (lo.keySet ++ hi.keySet).toSeq.sorted
    cols.map(c => (c, lo.getOrElse(c, Long.MinValue),
      hi.getOrElse(c, Long.MaxValue)))
  }

  /** Lower a resolved MERGE to [[TxLog.merge]]/[[TxLog.mergeDelete]],
    * or refuse with the supported shapes named. */
  private def lowerMerge(root: String, m: MergeIntoTable,
      source: LogicalPlan): LogicalPlan = {
    def unsupported(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"graft-tx MERGE: $why. Supported shapes: " +
          "[ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *] (keyed upsert -> " +
          "TxLog.merge) and [ON t.k = s.k WHEN MATCHED THEN DELETE] " +
          "(keyed delete -> TxLog.mergeDelete); richer clauses go " +
          "through the Scala API")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not lowered")
    val targetOut = m.targetTable.outputSet
    val sourceOut = source.outputSet
    // the ON condition must be a single name-equal key equality
    val keyCol = m.mergeCondition match {
      case CEq(a: AttributeReference, b: AttributeReference) =>
        val (t, s2) =
          if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
          else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
          else unsupported("the ON condition must compare one target " +
            "column with one source column")
        if (!t.name.equalsIgnoreCase(s2.name))
          unsupported(s"the ON columns must share a name (got " +
            s"${t.name} = ${s2.name}); alias the source")
        t.name
      case other =>
        unsupported(s"the ON condition must be a single key equality, " +
          s"got ${other.sql}")
    }
    // source column (by name) feeding each target column — SET * /
    // INSERT * resolve to exactly this shape. The analyzer wraps a
    // type-mismatched assignment in its store-assignment Cast
    // (ResolveRowLevelCommandAssignments); unwrap it to the source
    // attribute — GraftMergeCommand re-derives the cast from the PIN
    // through LoudCast, so the pair is still gated (incompatible
    // refused, narrowing raises on out-of-range) rather than refused
    // here as a "non-plain" assignment.
    def alignedMapping(assignments: Seq[Assignment],
        what: String): Map[String, String] =
      assignments.map { a =>
        val t = attrName(a.key, s"$what target")
        a.value match {
          case s2: Attribute if sourceOut.contains(s2) => t -> s2.name
          case c: org.apache.spark.sql.catalyst.expressions.Cast
              if c.child.isInstanceOf[Attribute] && sourceOut.contains(
                c.child.asInstanceOf[Attribute]) =>
            t -> c.child.asInstanceOf[Attribute].name
          case other => unsupported(
            s"$what must assign plain source columns (SET * / " +
              s"INSERT *), got ${t} = ${other.sql}")
        }
      }.toMap
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins))) =>
        val upM = alignedMapping(up, "WHEN MATCHED UPDATE")
        val insM = alignedMapping(ins, "WHEN NOT MATCHED INSERT")
        if (upM != insM)
          unsupported("UPDATE SET and INSERT columns must align " +
            "(the upsert writes ONE row per key)")
        GraftMergeCommand(root, keyCol, upM, source, None, m.withSchemaEvolution)
      case (Seq(DeleteAction(None)), Seq()) =>
        GraftMergeDeleteCommand(root, keyCol, source)
      // the CDC-apply staple: a source carrying a delete flag drives
      // deletes, updates AND inserts through ONE statement — exactly
      // TxLog.merge's deleteCol contract. The INSERT clause must be
      // guarded with NOT(<delete condition>): an UNguarded insert
      // would insert a not-matched flagged row (SQL's clause-order
      // semantics), which the keyed write path cannot express — the
      // refusal names the guard to add rather than silently dropping
      // the row.
      case (Seq(DeleteAction(Some(dc)), UpdateAction(None, up, _)),
          Seq(InsertAction(insCond, ins))) =>
        if (!dc.references.subsetOf(sourceOut))
          unsupported("the WHEN MATCHED AND <cond> THEN DELETE " +
            "condition must reference only source columns (it rides " +
            "the change batch)")
        val guarded = insCond.exists(c => c.semanticEquals(
          org.apache.spark.sql.catalyst.expressions.Not(dc)))
        if (!guarded)
          unsupported("with a conditional DELETE clause, guard the " +
            "INSERT as WHEN NOT MATCHED AND NOT (<delete condition>) " +
            "THEN INSERT * — an unguarded insert of a flagged-deleted " +
            "new key has no keyed-merge equivalent")
        val upM = alignedMapping(up, "WHEN MATCHED UPDATE")
        val insM = alignedMapping(ins, "WHEN NOT MATCHED INSERT")
        if (upM != insM)
          unsupported("UPDATE SET and INSERT columns must align")
        GraftMergeCommand(root, keyCol, upM, source, Some(bareSql(dc)), m.withSchemaEvolution)
      case (ma, na) =>
        unsupported(s"unsupported clause shape (${ma.length} matched, " +
          s"${na.length} not-matched, or conditional clauses)")
    }
  }
}

/** `MERGE ... UPDATE SET * / INSERT *` — the keyed upsert (plus,
  * with `deleteCondSql`, the CDC-apply form: flagged source rows
  * delete their key instead): the source plan projects into the
  * target's pinned column order/types and lands through
  * [[TxLog.merge]]'s manifest-pruned write path. Duplicate source
  * keys surface merge's own loud contract error.
  *
  * With `evolve` (`MERGE WITH SCHEMA EVOLUTION`, Delta's `autoMerge`
  * staple) the pin evolves FIRST, as its own audited commit, then the
  * normal pruned merge runs against the new pin: source-only columns
  * are auto-added (old rows read them as typed nulls), and a source
  * column LOSSLESSLY WIDER than its slot widens the slot
  * ([[TxLog.evolveSchema]]'s rules — int→long, float→double).
  * Conflicts evolution cannot express — string where the pin has a
  * numeric, map/struct mismatches — still refuse with the pair named:
  * evolution adds and widens, it never reinterprets. */
private[graft] case class GraftMergeCommand(root: String, keyCol: String,
    mapping: Map[String, String], source: LogicalPlan,
    deleteCondSql: Option[String], evolve: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = Shims.ofRows(spark, source)
    val evolved =
      if (evolve) evolvePin(spark, src.schema) else mapping
    val pin = TxLog.pinnedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"graft-tx MERGE: $root has no schema pin"))
    val t = org.apache.spark.sql.types.StructType.fromDDL(pin)
    // a USING temp view created before a schema evolution freezes the
    // OLD pin, so the analyzer's SET */INSERT * expansion misses
    // later-added columns — cover them by name when the source
    // carries them (identical to what a fresh view would expand to);
    // a pin column in neither stays the loud coverage error below
    val mapping2 = evolved ++ t.fields.collect {
      case f if !evolved.contains(f.name) &&
          src.schema.fieldNames.contains(f.name) => f.name -> f.name
    }
    val cols = t.fields.toSeq.map { f =>
      val from = mapping2.getOrElse(f.name,
        throw new UnsupportedOperationException(
          s"graft-tx MERGE: no source column assigned to target " +
            s"'${f.name}' — SET * / INSERT * must cover the pin [$pin]"))
      // same loud-cast gate as TxRelation.insert: under ansi=false a
      // bare cast of an incompatible source column coerces to NULL
      // silently — refuse instead (ANSI store-assignment rule), and
      // narrowing numerics go through LoudCast.cast so out-of-range
      // values raise instead of wrapping
      val fromType = src.schema(from).dataType
      LoudCast.gate(fromType, f.dataType,
        s"graft-tx MERGE: source column '$from' has type " +
          s"${fromType.sql} but target '${f.name}' is " +
          s"${f.dataType.sql} — refusing the silent-null coercion [$pin]")
      LoudCast.cast(col(from), fromType, f.dataType,
        "graft-tx MERGE", f.name).as(f.name)
    }
    val batch = src.select(
      cols ++ deleteCondSql.map(c => expr(c).as("__graft_del")): _*)
    val v = TxLog.merge(spark, root, batch, keyCol,
      deleteCol = deleteCondSql.map(_ => "__graft_del"),
      conflictRetries = 2)
    Seq(Row(v))
  }

  /** Evolve the pin against the source schema (WITH SCHEMA
    * EVOLUTION): widen slots a source column losslessly exceeds,
    * append source-only columns, commit through
    * [[TxLog.evolveSchema]] (a separate audited `evolve` commit, its
    * own additive/widening validation applying), and return the
    * mapping extended to cover the new pin. No-op (and no commit)
    * when the source fits the pin as-is. */
  private def evolvePin(spark: SparkSession,
      srcSchema: org.apache.spark.sql.types.StructType)
      : Map[String, String] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.StructType
    val pin0 = TxLog.pinnedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"graft-tx MERGE: $root has no schema pin"))
    val t0 = StructType.fromDDL(pin0)
    // a slot's feeding source column: the assignment mapping when the
    // SET * expansion saw the column, the source column of the same
    // name otherwise (frozen pre-evolution views expand over the old
    // pin — see the mapping extension below)
    def feeds(name: String): Option[String] =
      mapping.get(name).orElse(
        Some(name).filter(srcSchema.fieldNames.contains))
    val widened = t0.fields.map { f =>
      feeds(f.name).map(srcSchema(_).dataType) match {
        case Some(st) if st != f.dataType && Cast.canUpCast(f.dataType, st) =>
          // attempted widenings outside evolveSchema's stricter
          // lossless rule (e.g. int→double) surface ITS loud refusal
          f.copy(dataType = st)
        case _ => f
      }
    }
    // Delta's autoMerge rule: every source column the pin lacks is
    // added (typed from the source; old rows read typed nulls). The
    // SET */INSERT * expansion happened against the OLD pin, so the
    // mapping is extended by-name here.
    val mappedSrc = mapping.values.toSet
    val added = srcSchema.fields.filterNot(f =>
      mappedSrc.contains(f.name) || t0.fieldNames.contains(f.name))
    val newT = StructType(widened ++ added)
    if (newT != t0)
      TxLog.evolveSchema(spark, root, newT.toDDL)
    // cover every pin column the assignments missed but the source
    // carries by name — not just the ones added THIS statement: a
    // USING temp view freezes its schema at creation, so a target
    // resolved through a pre-evolution view expands SET * over the
    // OLD columns while the pin already carries the earlier additions
    mapping ++ newT.fields.collect {
      case f if !mapping.contains(f.name) &&
          srcSchema.fieldNames.contains(f.name) => f.name -> f.name
    }
  }

  override def output: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())
}

/** `MERGE ... WHEN MATCHED THEN DELETE` — the keyed delete:
  * [[TxLog.mergeDelete]] over the source's (deduplicated) key set. */
private[graft] case class GraftMergeDeleteCommand(root: String,
    keyCol: String, source: LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val keys = Shims.ofRows(spark, source).select(col(keyCol))
    val v = TxLog.mergeDelete(spark, root, keys, keyCol,
      conflictRetries = 2)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())
}

/** `UPDATE t SET ... WHERE ...` — assignments and predicate travel as
  * SQL text (resolved-expression `.sql`, re-resolved by name against
  * the touched-dir read) plus the predicate's implied bounds;
  * [[TxLog.updateWhere]] rewrites only the admitted dirs. */
private[graft] case class GraftUpdateCommand(root: String,
    set: Seq[(String, String)], condSql: Option[String],
    bounds: Seq[(String, Long, Long)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cond = condSql.map(expr).getOrElse(
      org.apache.spark.sql.functions.lit(true))
    val v = TxLog.updateWhere(spark, root,
      set.map { case (c, e) => (c, expr(e)) }, cond,
      condSql.map(_ => bounds).getOrElse(Seq.empty), conflictRetries = 2)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())
}

/** `DELETE FROM t WHERE ...` — [[TxLog.deleteWhere]] under the
  * predicate's implied bounds. */
private[graft] case class GraftDeleteCommand(root: String,
    condSql: String, bounds: Seq[(String, Long, Long)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TxLog.deleteWhere(spark, root, expr(condSql), bounds,
      conflictRetries = 2)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())
}
