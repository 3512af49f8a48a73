package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Behavior
import graft.operators.Behavior.{Conversion, FunnelEvent}

/** Streaming conversion latency must equal the batch form on the same
  * events: (1) the conversionsStream emissions are exactly the batch
  * funnel's completed-stage rows, and (2) the per-window percentile
  * emission equals a batch windowed aggregate over those conversions,
  * for every window the watermark closed.
  */
class ConversionLatencyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private lazy val ev = graft.core.Tables.events(spark, sf0001)
    .select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("tu"))

  private lazy val batchConversions: Set[Conversion] =
    Behavior.funnelStages(ev, steps)
      .filter(col("stage") === 3)
      .select(col("user_id"), col("t1"), col("t3"), (col("t3") - col("t1")).as("lat"))
      .collect()
      .map(r => Conversion(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("conversionsStream emits exactly the batch completed-funnel rows") {
    val all = ev.as[FunnelEvent].collect().sortBy(_.tu)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
    val src = MemoryStream[FunnelEvent](spark)
    val q = Behavior.conversionsStream(src.toDS(), steps)
      .writeStream.format("memory").queryName("conv_rows")
      .outputMode("append").start()
    chunks.foreach { c => src.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("conv_rows").as[Conversion].collect().toSet
    assert(batchConversions.nonEmpty)
    assert(streamed == batchConversions)
  }

  test("per-window percentiles equal the batch windowed aggregate on closed windows") {
    val windowSec = 3600
    val all = ev.as[FunnelEvent].collect().sortBy(_.tu)
    // sentinel user converts two windows past the end of data — its
    // completion advances the watermark so every data window closes
    val sentinelT = all.last.tu + 2L * windowSec * 1000000L
    val sentinel = Seq(
      FunnelEvent(-1L, "view", sentinelT),
      FunnelEvent(-1L, "click", sentinelT + 1),
      FunnelEvent(-1L, "purchase", sentinelT + 2))
    val chunks = all.grouped((all.length + 1) / 2).toSeq :+ sentinel.toArray

    val src = MemoryStream[FunnelEvent](spark)
    val q = Behavior.conversionLatencyStream(
        Behavior.conversionsStream(src.toDS(), steps), windowSec)
      .writeStream.format("memory").queryName("conv_lat")
      .outputMode("append").start()
    chunks.foreach { c => src.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("conv_lat")
      .select(col("win_start").cast("long"), col("n_converted"),
        col("p50_us"), col("p90_us"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

    val expected = batchConversions.toSeq.toDS()
      .withColumn("ts", timestamp_micros(col("t_last")))
      .groupBy(window(col("ts"), s"$windowSec seconds"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(latency_us, 0.5)").as("p50"),
        expr("percentile(latency_us, 0.9)").as("p90"))
      .select(col("window.start").cast("long"), col("n"), col("p50"), col("p90"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

    assert(expected.nonEmpty)
    // every batch window is emitted by the stream (all closed before the
    // sentinel's); the stream may additionally hold back the sentinel's
    // own still-open window
    expected.foreach { case (w, agg) =>
      assert(streamed.get(w).contains(agg), s"window $w: ${streamed.get(w)} vs $agg")
    }
    assert((streamed.keySet -- expected.keySet).forall(_ >= sentinelT / 1000000L / windowSec * windowSec))
  }
}
