package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Behavior
import graft.operators.Behavior.{FunnelEvent, StageAdvance}

/** Streaming funnel (flatMapGroupsWithState) must equal the batch
  * min-aggregate form on the same events, with per-user state surviving
  * micro-batch boundaries.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("stream equals batch funnel on fixture events; state crosses batches") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tu"))
    val batchStages = Behavior.funnelStages(ev, steps)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap

    // feed in 3 chunks split on global event-time order, so each user's
    // events arrive in order ACROSS batches (the delivery contract);
    // within a chunk the group sorts itself
    val all = ev.as[FunnelEvent].collect().sortBy(_.tu)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
    val src = MemoryStream[FunnelEvent](spark)
    val q = Behavior.funnelStream(src.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    chunks.foreach { c => src.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()

    val advances = spark.table("funnel_adv").as[StageAdvance].collect()
    // one advance per (user, stage), strictly increasing stages
    assert(advances.groupBy(a => (a.user_id, a.stage)).forall(_._2.length == 1))
    val streamed = advances.groupBy(_.user_id)
      .map { case (u, as) => u -> as.map(_.stage).max.toLong }
    val users = batchStages.keySet
    users.foreach { u =>
      assert(streamed.getOrElse(u, 0L) == batchStages(u),
        s"user $u: stream ${streamed.getOrElse(u, 0L)} vs batch ${batchStages(u)}")
    }
  }

  test("a mid-funnel batch boundary does not re-anchor or re-emit") {
    val src = MemoryStream[FunnelEvent](spark)
    val q = Behavior.funnelStream(src.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_edge")
      .outputMode("append").start()
    // batch 1: view@10 then a dead click@10 (not strictly after)
    src.addData(FunnelEvent(7L, "click", 10L), FunnelEvent(7L, "view", 10L))
    q.processAllAvailable()
    // batch 2: click@20 converts against the PERSISTED anchor, then
    // purchase@20 is dead (ties lose), purchase@25 converts
    src.addData(FunnelEvent(7L, "purchase", 20L), FunnelEvent(7L, "click", 20L),
      FunnelEvent(7L, "purchase", 25L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_edge").as[StageAdvance].collect().toSet
    assert(got == Set(StageAdvance(7L, 1, 10L), StageAdvance(7L, 2, 20L),
      StageAdvance(7L, 3, 25L)))
  }
}
