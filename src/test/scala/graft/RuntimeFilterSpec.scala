package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Runtime row-level filtering — Spark's bloom-filter runtime filter
  * injects a might_contain() pre-filter on the fact side of a join
  * when the other side is selective: at 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * rows. Config-driven, but worth proving it actually fires on this
  * library's join shapes.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter fires on a selective fact join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf0001)
      val selectiveOrders = Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 450000) // a handful of orders
        .select(col("o_orderkey"), col("o_totalprice"))
      val joined = li.join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom runtime filter on the fact side:\n$plan")
      // and it is a pure pre-filter: results equal the unfiltered plan
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(selectiveOrders, col("l_orderkey") === col("o_orderkey")).count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == expected)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
