package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the
  * named queries (or all). Used to audit the scale-critical properties
  * per query: PushedFilters / ReadSchema on scans, broadcast vs shuffle
  * join selection, WholeStageCodegen span coverage, exchange count.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // fixture tables are single ~30MB parquet files; the default 128MB
      // split size would scan them on ONE core — split finer so the
      // scan parallelizes (the 100 TB knob, pointed the other way)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // collect_set profiles run in ObjectHashAggregate, whose default
      // 128-keys-per-partition fallback silently degrades to SORT-based
      // aggregation on any real corpus slice — raise it (state is ~KB/key)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16384")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
        // Under AQE the pre-execution plan is `isFinalPlan=false` and
        // carries NO WholeStageCodegen markers ([codegen id : N] is
        // assigned when codegen stages are inserted at execution time) —
        // an unexecuted explain would audit every query as 0 codegen
        // stages. Execute THIS QueryExecution first (cheap at sf0.001),
        // then print: the cached adaptive plan is now the final one.
        qe.toRdd.count()
        println(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      // iterative operators leave checkpoints pinned; sweep per query so
      // a 100+-query explain session doesn't accumulate dead blocks
      graft.core.CacheScope.releaseStragglers(spark)
    }
    spark.stop()
  }
}
