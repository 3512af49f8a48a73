package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Plain-SQL-text surface for the custom as-of join: a TABLE FUNCTION
  *
  * {{{
  *   SELECT * FROM asof_join('probe_view', 'state_view',
  *                           'key_col', 'ts_col', 'payload_col'[, inner])
  * }}}
  *
  * registered through `SparkSessionExtensions.injectTableFunction` (or
  * [[AsOfSqlFunction.register]] on a live session). The builder runs at
  * analysis time on the driver: it resolves both table names against
  * the active session's catalog, assembles the same
  * [[AsOfJoinPlan]]-plus-projection tree the
  * [[graft.operators.AsOfJoin.asOfExec]] Column API builds, and splices
  * the fully-resolved subtree into the enclosing query — so SQL text,
  * the DataFrame API, and the DuckDB oracle all exercise the identical
  * physical operator. Arguments must be string literals (table/column
  * names are structural, not data), plus an optional boolean literal
  * for the inner form.
  */
object AsOfSqlFunction {

  val ident: FunctionIdentifier = FunctionIdentifier("asof_join")

  val info: ExpressionInfo =
    new ExpressionInfo(AsOfSqlFunction.getClass.getCanonicalName, "asof_join")

  def builder(args: Seq[Expression]): LogicalPlan = {
    def str(e: Expression, pos: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"asof_join: $pos must be a STRING literal, got $other")
    }
    require(args.length == 5 || args.length == 6,
      "asof_join(probe_table, state_table, key, ts, payload[, inner]) " +
        s"takes 5 or 6 arguments, got ${args.length}")
    val probeT = str(args(0), "probe_table")
    val stateT = str(args(1), "state_table")
    val key = str(args(2), "key")
    val ts = str(args(3), "ts")
    val payload = str(args(4), "payload")
    val inner = args.lift(5).map {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"asof_join: inner must be a BOOLEAN literal, got $other")
    }.getOrElse(false)
    val spark = SparkSession.active
    val out = graft.operators.AsOfJoin.asOfExec(
      spark.table(probeT), spark.table(stateT),
      Seq(key), ts, Seq(payload), inner = inner)
    out.queryExecution.analyzed
  }

  /** Register on a live session (GraftExtensions covers
    * extension-built sessions). Idempotent: re-registration overwrites.
    */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.PlanBridge.registerTableFunction(
      spark, ident, info, builder)
}
