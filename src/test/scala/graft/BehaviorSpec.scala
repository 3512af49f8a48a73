package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior
import graft.queries.BehaviorQueries

/** Semantics of the behavior suite. The driver's DuckDB oracle proves
  * cross-engine agreement; these pin the INTENT on hand-built rows
  * (both engines could agree on a wrong definition).
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: sequential semantics — out-of-order steps do not convert") {
    // u1 completes in order; u2's purchase precedes its click (stage 2);
    // u3 clicks before viewing (stage 1 — the pre-view click is dead);
    // u4 never views (stage 0) despite click+purchase.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      (3L, "click", 5L), (3L, "view", 10L),
      (4L, "click", 10L), (4L, "purchase", 20L)
    ).toDF("user_id", "event_type", "tu")
    val out = Behavior.funnelStages(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("funnel: anchor is the FIRST qualifying event, ties need strict order") {
    // click at exactly the view's time does not count (strict >);
    // the later click does.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 10L), (1L, "click", 40L)
    ).toDF("user_id", "event_type", "tu")
    val row = Behavior.funnelStages(ev, Seq("view", "click"))
      .collect().head
    assert(row.getLong(1) == 2L && row.getLong(3) == 40L)
  }

  test("property: random event streams match the funnel definition") {
    // reference computed straight from the definition (not a greedy
    // scan): t1 = min view; t_k = min step-k tu strictly after t_{k-1}.
    // Small tu range forces heavy timestamp collisions — the regime
    // where strict-> anchoring and tie handling could diverge.
    def ref(evs: Seq[(Long, String, Long)]): Map[Long, Long] =
      evs.groupBy(_._1).map { case (u, es) =>
        def first(step: String, after: Option[Long]): Option[Long] = after match {
          case None => None
          case Some(a) =>
            es.collect { case (_, t, tu) if t == step && tu > a => tu }
              .minOption
        }
        val t1 = es.collect { case (_, "view", tu) => tu }.minOption
        val t2 = first("click", t1)
        val t3 = first("purchase", t2)
        u -> Seq(t1, t2, t3).count(_.isDefined).toLong
      }
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ev = for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.oneOf("view", "click", "purchase", "error")
      tu <- Gen.chooseNum(1L, 20L)
    } yield (u, t, tu)
    val stream = Gen.chooseNum(10, 40).flatMap(n => Gen.listOfN(n, ev))
    (1 to 5).foreach { i =>
      val evs = stream.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val got = Behavior.funnelStages(
          evs.toDF("user_id", "event_type", "tu"),
          Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref(evs), s"seed $i: $evs")
    }
  }

  test("winsorize: clipped range is [p5, p95] and interior values pass through") {
    val out = BehaviorQueries.queries("q_winsorize")(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(min(col("value_clipped")).as("lo"), max(col("value_clipped")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(out.nonEmpty)
    // every group's clipped extent must be inside the raw extent,
    // strictly so at the top for a 1000-row group (p95 < max)
    val raw = graft.core.Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("rlo"), max(col("value")).as("rhi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (rlo, rhi) = raw(r.getString(0))
      assert(r.getDouble(1) >= rlo && r.getDouble(2) <= rhi)
      assert(r.getDouble(2) < rhi, s"${r.getString(0)}: p95 clip missing")
    }
  }

  test("cohort retention: offsets start at 0 and users conserve across cells") {
    val cells = BehaviorQueries.queries("q_cohort_retention")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.forall(_._2 >= 0))
    // week-0 cell of each cohort counts every user of that cohort, so
    // per cohort: n(offset 0) >= n(any later offset)
    val byCohort = cells.groupBy(_._1)
    byCohort.foreach { case (_, cs) =>
      val w0 = cs.find(_._2 == 0L).map(_._3).getOrElse(0L)
      assert(cs.forall(_._3 <= w0))
    }
  }
}
