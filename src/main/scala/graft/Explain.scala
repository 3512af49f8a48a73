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
    // knob rationale: core/GraftSession.scala (shared with Bench/Verify)
    val spark = graft.core.GraftSession.local(cpus, "graft-explain")
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
