package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The opt-in Catalyst rule must turn a raw range-predicate join into
  * the binned equi-join plan — same rows, no nested-loop join.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val points = (0L until 1000L).toDF("pt")
  private val intervals = Seq(
    (1L, 100L, 200L), (2L, 150L, 160L), (3L, 250L, 550L), (4L, 990L, 2000L))
    .toDF("iv_id", "start_s", "end_s")

  private def rangeJoin = points.join(intervals,
    col("pt") >= col("start_s") && col("pt") < col("end_s"))

  test("disabled by default: raw range join keeps its nested-loop plan") {
    val plan = rangeJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("with the rule on, the plan is an equi-join and rows are identical") {
    val expected = rangeJoin.select("pt", "iv_id").as[(Long, Long)].collect().toSet
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ new RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.binWidthKey, "100")
    try {
      val got = rangeJoin
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join should have been equi-ized:\n$plan")
      assert(got.select("pt", "iv_id").as[(Long, Long)].collect().toSet == expected)
      // output schema unchanged by the rewrite (bins projected away)
      assert(got.columns.toSeq == Seq("pt", "iv_id", "start_s", "end_s"))
    } finally {
      spark.conf.set(RangeJoinRewrite.binWidthKey, "0")
      spark.experimental.extraOptimizations = prior
    }
  }

  test("q_range_join_auto runs under the rule with no nested-loop join") {
    val df = SparkEntry.queries("q_range_join_auto")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"catalog range join should plan as the binned equi-join:\n$plan")
    assert(plan.contains("_graft_pt_bin"),
      "expected the rewrite's bin key in the plan")
    // identical rows to the hand-binned operator form (collected — the
    // two frames deliberately belong to different sessions)
    val manual = SparkEntry.queries("q_range_join")(spark, sf0001)
    assert(df.collect().toSet == manual.collect().toSet)
  }

  test("q_range_join_auto's rule + conf are scoped to its child session") {
    SparkEntry.queries("q_range_join_auto")(spark, sf0001)
    // the child session inherits the builder's options (the query's
    // epoch math depends on the UTC session timezone carrying over)
    assert(spark.newSession().conf.get("spark.sql.session.timeZone") == "UTC")
    // the caller's session gained no optimizer rule and no bin conf...
    assert(!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RangeJoinRewrite]))
    assert(spark.conf.getOption(RangeJoinRewrite.binWidthKey).forall(_ == "0"))
    // ...so an unrelated pure-range join in the caller's session keeps
    // Spark's own (nested-loop) plan — it is NOT silently rewritten
    val plan = rangeJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"caller-session range join must be untouched by the query's rule:\n$plan")
  }

  test("rule leaves equi-joins and non-matching conditions alone") {
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ new RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.binWidthKey, "100")
    try {
      val a = Seq((1L, 10L)).toDF("k", "va")
      val b = Seq((1L, 20L)).toDF("k2", "vb")
      // plain equi-join: untouched, still answers correctly
      assert(a.join(b, col("k") === col("k2")).count() == 1)
      // three-conjunct condition (equi + range): not the pure-range
      // shape — left to Spark's own planning, still correct
      val mixed = a.join(b, col("k") === col("k2") &&
        col("va") >= col("k2") && col("va") < col("vb"))
      assert(mixed.count() == 1)
    } finally {
      spark.conf.set(RangeJoinRewrite.binWidthKey, "0")
      spark.experimental.extraOptimizations = prior
    }
  }
}
