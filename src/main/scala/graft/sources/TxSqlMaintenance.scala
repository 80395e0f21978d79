package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DataType, StructType, TimestampType}

import graft.operators.TxLog

/** The SQL MAINTENANCE + DDL statements a lake operator types (the
  * Delta `DESCRIBE HISTORY` / `VACUUM` / `ALTER TABLE` / `OPTIMIZE` /
  * `RESTORE` surface plus read-side TIME TRAVEL), injected as a
  * delegating parser beside the DML rule — [[TxSparkExtensions]]
  * registers both, so one session config opens the WHOLE SQL door:
  * create (CTAS), write (INSERT/MERGE/UPDATE/DELETE), read (views,
  * `VERSION AS OF` / `TIMESTAMP AS OF`), evolve (ALTER TABLE), layout
  * (OPTIMIZE), undo (RESTORE), audit (HISTORY/DETAIL) and reclaim
  * (VACUUM):
  *
  * {{{
  *   SELECT ... FROM t VERSION AS OF 7            -- travel read
  *   SELECT ... FROM t TIMESTAMP AS OF '...'      -- travel read
  *   DESCRIBE HISTORY t
  *   DESCRIBE DETAIL  t
  *   VACUUM t RETAIN <n> VERSIONS [GRACE <ms> MS] [DRY RUN]
  *   ALTER TABLE t ADD COLUMNS (c TYPE, ...)
  *   ALTER TABLE t ALTER COLUMN c TYPE <widening type>
  *   ALTER TABLE t RENAME COLUMN a TO b
  *   ALTER TABLE t DROP COLUMN a
  *   ALTER TABLE t ADD CONSTRAINT name CHECK (expr)
  *   ALTER TABLE t DROP CONSTRAINT name
  *   OPTIMIZE t RANGE(col, n)|HASH(col, n)|ZORDER(x, y, n)|COMPACT(rows)
  *   RESTORE TABLE t TO VERSION AS OF n
  *   CREATE TABLE '<dst>' SHALLOW CLONE t
  * }}}
  *
  * `t` is a `'path'` literal (always ours) or a NAME — a temp view or
  * catalog table; names resolve through the session catalog, and a
  * name that is not a graft-tx table delegates verbatim (ALTER TABLE
  * on a parquet table keeps its Spark meaning). Time travel rides
  * Spark's own grammar: the parsed [[RelationTimeTravel]] node is
  * rewritten — BEFORE analysis would refuse it for a v1 source — into
  * the relation's existing `versionAsOf` options, so tombstone masks,
  * clone chains, rename lineage and the retention guard all apply
  * exactly as API travel reads. Everything else delegates verbatim.
  * VACUUM without DRY RUN deletes for real and records the retention
  * horizon as a gc commit (TxLog.vacuum's contract: travel reads
  * below it fail at plan time with the window named); the default
  * 24h grace protects in-flight writers exactly as the API default
  * does. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // a statement target: '<table root>' literal or a (possibly
  // multipart / backquoted) table or view name
  private val T = """('[^']+'|[\w.`]+)"""

  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*""").r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + T + """\s+RETAIN\s+(\d+)\s+VERSIONS""" +
      """(?:\s+GRACE\s+(\d+)\s+MS)?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val AlterAdd =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+COLUMNS?\s*\(\s*(.+?)\s*\)\s*;?\s*""").r
  private val AlterType =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+(?:ALTER|CHANGE)\s+COLUMN\s+`?(\w+)`?\s+TYPE\s+""" +
      """([\w()<>,\s]+?)\s*;?\s*""").r
  private val AlterRename =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*""").r
  private val AlterDrop =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+COLUMNS?\s+`?(\w+)`?\s*;?\s*""").r
  private val AlterAddCheck =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+CONSTRAINT\s+`?(\w+)`?\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val AlterDropCheck =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+CONSTRAINT\s+`?(\w+)`?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """\s+(RANGE|HASH|ZORDER|COMPACT)\s*\(\s*([^)]*?)\s*\)\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + T +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val Clone =
    ("""(?is)\s*CREATE\s+TABLE\s+'([^']+)'\s+SHALLOW\s+CLONE\s+""" +
      T + """\s*;?\s*""").r

  /** The graft-tx relation a NAME resolves to (temp view or catalog
    * table), via the session catalog's own resolution — None when the
    * name is unknown or not backed by [[TxRelation]]. */
  private def txRelationOf(name: String): Option[TxRelation] =
    try {
      session.table(name).queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[TxRelation] =>
          lr.relation.asInstanceOf[TxRelation]
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resolve a statement target: `'path'` literal (taken verbatim) or
    * name (resolved to the relation's root; None = not ours). */
  private def targetRoot(raw: String): Option[String] =
    if (raw.startsWith("'")) Some(raw.substring(1, raw.length - 1))
    else txRelationOf(raw).map(_.tableRoot)

  /** The NAME form of a target (None for path literals) — threaded
    * into schema-changing commands for metastore-schema sync. */
  private def nameOf(raw: String): Option[String] =
    if (raw.startsWith("'")) None else Some(raw)

  /** Our own statements (no Spark grammar fallback exists) demand a
    * resolvable tx target. */
  private def requireRoot(raw: String, stmt: String): String =
    targetRoot(raw).getOrElse(throw new IllegalArgumentException(
      s"$stmt: '$raw' is not a graft-tx table (path literals are " +
        "taken verbatim; names must resolve to a graft-tx temp view " +
        "or catalog table)"))

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case History(p) => GraftHistoryCommand(requireRoot(p, "DESCRIBE HISTORY"))
    case Detail(p) => GraftDetailCommand(requireRoot(p, "DESCRIBE DETAIL"))
    case Vacuum(p, n, grace, dry) =>
      GraftVacuumCommand(requireRoot(p, "VACUUM"), n.toInt,
        Option(grace).map(_.toLong).getOrElse(24L * 3600 * 1000),
        dry != null)
    // ALTER TABLE has a Spark meaning for non-tx names — delegate
    // those. Name targets ride along into the command so a
    // schema-changing ALTER can sync the metastore's stored schema
    // (v1 resolution throws on a stale one).
    case AlterAdd(p, cols) => targetRoot(p) match {
      case Some(root) => GraftAddColumnsCommand(root, cols, nameOf(p))
      case None => delegate.parsePlan(sqlText)
    }
    case AlterType(p, c, t) => targetRoot(p) match {
      case Some(root) => GraftAlterColumnTypeCommand(root, c, t, nameOf(p))
      case None => delegate.parsePlan(sqlText)
    }
    case AlterRename(p, from, to) => targetRoot(p) match {
      case Some(root) => GraftRenameColumnCommand(root, from, to, nameOf(p))
      case None => delegate.parsePlan(sqlText)
    }
    case AlterDrop(p, c) => targetRoot(p) match {
      case Some(root) => GraftDropColumnCommand(root, c, nameOf(p))
      case None => delegate.parsePlan(sqlText)
    }
    case AlterAddCheck(p, name, cond) => targetRoot(p) match {
      case Some(root) => GraftAddConstraintCommand(root, name, cond)
      case None => delegate.parsePlan(sqlText)
    }
    case AlterDropCheck(p, name) => targetRoot(p) match {
      case Some(root) => GraftDropConstraintCommand(root, name)
      case None => delegate.parsePlan(sqlText)
    }
    case Optimize(p, mode, args) =>
      GraftOptimizeCommand(requireRoot(p, "OPTIMIZE"), mode,
        args.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    case Restore(p, v) =>
      GraftRestoreCommand(requireRoot(p, "RESTORE TABLE"), v.toLong)
    // the Delta zero-copy fork, SQL-spelled: the DESTINATION is a
    // path literal (a fresh root, nothing to resolve); the source is
    // a path or name
    case Clone(dst, src) =>
      GraftCloneCommand(requireRoot(src, "SHALLOW CLONE"), dst)
    case other => rewriteTimeTravel(delegate.parsePlan(other))
  }

  /** Rewrite `FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts` on
    * graft-tx tables into the relation's existing travel options.
    * Spark's grammar already parses the suffix into
    * [[RelationTimeTravel]]; its ANALYZER then refuses it for every
    * v1 source — so the rewrite happens here, on the parsed tree,
    * where the node still exists. Non-tx names are left for Spark's
    * own (v2 catalog) time-travel resolution. */
  private def rewriteTimeTravel(plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists(_.isInstanceOf[RelationTimeTravel])) return plan
    plan.transformUp {
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if txRelationOf(quoted(u.multipartIdentifier)).isDefined =>
        val rel = txRelationOf(quoted(u.multipartIdentifier)).get
        require(!rel.isTravel,
          "graft-tx time travel: the relation is ALREADY a travel read " +
            "(versionAsOf/timestampAsOf options) — travel on travel is " +
            "ambiguous; query the base table")
        val root = rel.tableRoot
        val v: Long = (ver, ts) match {
          case (Some(s), _) =>
            try s.trim.toLong catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"graft-tx VERSION AS OF: '$s' is not a version number")
            }
          case (None, Some(e)) =>
            require(e.resolved && e.foldable,
              s"graft-tx TIMESTAMP AS OF must be a literal timestamp, " +
                s"got ${e.sql}")
            val zone = session.sessionState.conf.sessionLocalTimeZone
            val micros = Option(Cast(e, TimestampType, Some(zone))
              .eval(null)).getOrElse(throw new IllegalArgumentException(
                s"graft-tx TIMESTAMP AS OF: ${e.sql} is not a valid " +
                  "timestamp")).asInstanceOf[Long]
            TxLog.versionAtTime(session, root, Math.floorDiv(micros, 1000L))
          case _ => throw new IllegalStateException(
            "time travel with neither version nor timestamp")
        }
        // a version beyond the head would silently fold to the head
        // (the fold reads every manifest <= asOf) — refuse it by name
        // instead, like a below-horizon read is refused
        val headV = TxLog.latestVersion(session, root)
        require(v >= 1 && v <= headV,
          s"graft-tx VERSION AS OF $v: $root has versions 1..$headV")
        val travel = new TxDataSource().createRelation(
          session.sqlContext, Map("path" -> root, "versionAsOf" -> v.toString))
        SubqueryAlias(u.multipartIdentifier.last,
          LogicalRelation(travel, isStreaming = false))
    }
  }

  private def quoted(parts: Seq[String]): String =
    parts.map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    rewriteTimeTravel(delegate.parseQuery(sqlText))
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `DESCRIBE HISTORY '<root>'` — [[TxLog.history]] as a SQL result
  * set (manifest reads only; commit-count-sized). */
private[graft] case class GraftHistoryCommand(root: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType.fromDDL("version BIGINT, action STRING, n_adds BIGINT, " +
      "rows_added BIGINT, n_removes BIGINT, txn_app STRING, " +
      "txn_batch BIGINT"))
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.history(spark, root).collect().toSeq
}

/** `DESCRIBE DETAIL '<root>'` — [[TxLog.detail]]'s one operational
  * summary row. */
private[graft] case class GraftDetailCommand(root: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType.fromDDL("version BIGINT, n_live_dirs BIGINT, " +
      "phys_rows BIGINT, live_tombstones BIGINT, n_constraints BIGINT, " +
      "stats_col STRING, clone_depth BIGINT, last_checkpoint BIGINT, " +
      "gc_horizon BIGINT"))
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.detail(spark, root).collect().toSeq
}

/** `VACUUM '<root>' RETAIN n VERSIONS [GRACE ms MS] [DRY RUN]` — one
  * row per reclaimable (DRY RUN) or reclaimed data dir. */
private[graft] case class GraftVacuumCommand(root: String,
    retainVersions: Int, graceMs: Long, dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType.fromDDL("data_dir STRING, reclaimed BOOLEAN"))
  override def run(spark: SparkSession): Seq[Row] = {
    val dirs =
      if (dryRun) TxLog.vacuumCandidates(spark, root, retainVersions,
        graceMs)
      else TxLog.vacuum(spark, root, retainVersions, graceMs)
    dirs.map(d => Row(d, !dryRun))
  }
}
