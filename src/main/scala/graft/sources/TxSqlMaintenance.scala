package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.TxLog

/** The SQL MAINTENANCE statements a lake operator types (the Delta
  * `DESCRIBE HISTORY` / `DESCRIBE DETAIL` / `VACUUM` surface, path-
  * addressed), injected as a delegating parser beside the DML rule —
  * [[TxSparkExtensions]] registers both, so one session config opens
  * the WHOLE SQL door: create (CTAS), write (INSERT/MERGE/UPDATE/
  * DELETE), read (views, travel options), audit (HISTORY/DETAIL) and
  * reclaim (VACUUM):
  *
  * {{{
  *   DESCRIBE HISTORY '<table root>'
  *   DESCRIBE DETAIL  '<table root>'
  *   VACUUM '<table root>' RETAIN <n> VERSIONS [GRACE <ms> MS] [DRY RUN]
  * }}}
  *
  * Everything else delegates verbatim to Spark's parser. VACUUM
  * without DRY RUN deletes for real and records the retention
  * horizon as a gc commit (TxLog.vacuum's contract: travel reads
  * below it fail at plan time with the window named); the default
  * 24h grace protects in-flight writers exactly as the API default
  * does. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)\s+VERSIONS""" +
      """(?:\s+GRACE\s+(\d+)\s+MS)?(\s+DRY\s+RUN)?\s*;?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case History(p) => GraftHistoryCommand(p)
    case Detail(p) => GraftDetailCommand(p)
    case Vacuum(p, n, grace, dry) =>
      GraftVacuumCommand(p, n.toInt,
        Option(grace).map(_.toLong).getOrElse(24L * 3600 * 1000),
        dry != null)
    case other => delegate.parsePlan(other)
  }

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
    delegate.parseQuery(sqlText)
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
