package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 100L, 200L),   // [100, 200)
    (2L, 150L, 160L),   // nested inside 1
    (3L, 250L, 550L))   // spans 3 bins at width 100
    .toDF("iv_id", "start_s", "end_s")

  private val points = Seq(99L, 100L, 150L, 199L, 200L, 249L, 250L, 549L, 550L)
    .toDF("pt")

  test("binned range join equals the brute-force range predicate") {
    val got = RangeJoin.pointInInterval(points, intervals, "pt", "start_s", "end_s",
        binWidth = 100)
      .select("pt", "iv_id").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .filter(col("pt") >= col("start_s") && col("pt") < col("end_s"))
      .select("pt", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == brute)
    // boundary semantics pinned: start inclusive, end exclusive
    assert(got.contains((100L, 1L)) && !got.contains((200L, 1L)))
    assert(got.contains((549L, 3L)) && !got.contains((550L, 3L)))
    // the multi-bin interval catches points in every bin it overlaps
    assert(got.contains((250L, 3L)) && got.contains((549L, 3L)))
  }

  test("plan is an equi-join on the bin, not a nested-loop cross product") {
    val plan = RangeJoin.pointInInterval(points, intervals, "pt", "start_s", "end_s",
        binWidth = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
