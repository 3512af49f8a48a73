package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area catalogs; every entry with a
  * SQL-expressible semantics also appears in `oracleSql` (DuckDB ANSI SQL
  * over the same parquet tables, column names aligned — the driver's
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on sf0.001 (the reference job1 pipeline shape:
    * join → sliding-window avg → CASE alerts); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_monitor_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ MonitorQueries.queries ++ DedupQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++ MiscQueries.queries ++
      AnalyticsQueries.queries ++ CurationQueries.queries ++
      TimeSeriesQueries.queries ++ ProfilingQueries.queries ++
      BehaviorQueries.queries ++ GraphQueries.queries ++ StatsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ MonitorQueries.oracles ++ DedupQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++ MiscQueries.oracles ++
      AnalyticsQueries.oracles ++ CurationQueries.oracles ++
      TimeSeriesQueries.oracles ++ ProfilingQueries.oracles ++
      BehaviorQueries.oracles ++ GraphQueries.oracles ++ StatsQueries.oracles
}
