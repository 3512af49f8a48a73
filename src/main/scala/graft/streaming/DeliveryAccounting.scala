package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.core.PipelineConfig

/** A4 delivery accounting with ERROR counters — the full analog of the
  * reference producer's per-topic success/error callback dictionaries
  * (`producer/producer.py:44-58`): every topic keeps a success count and
  * an error count, updated as messages flow.
  *
  * Semantics note (engine difference, not a gap): kafka-python surfaces
  * per-message delivery failures via callbacks; a Spark sink either
  * commits a micro-batch or aborts it wholesale, so the per-message
  * "error" that survives inside a committed batch is a message that is
  * INVALID for delivery (null/empty payload, oversize, encode failure) —
  * expressed here as a caller-supplied predicate. Sink-level failures
  * remain batch-atomic (the stronger guarantee).
  *
  * Mechanics: `observe()` attaches named aggregates to the streaming
  * plan — counted by the engine during normal execution, no second pass,
  * no extra shuffle — and [[DeliveryStatsListener]] accumulates the
  * per-batch observations into running totals exactly like the
  * reference's `success_count`/`error_count` dicts.
  */
object DeliveryAccounting {

  val observationName = "delivery"

  private def metricCols(cfg: PipelineConfig, isError: Column): Seq[Column] = {
    val topics = Seq(cfg.cpuTopic, cfg.memTopic, cfg.netTopic, cfg.diskTopic)
    topics.flatMap { t =>
      Seq(
        count(when(col("topic") === t && !isError, lit(1))).as(s"success_$t"),
        count(when(col("topic") === t && isError, lit(1))).as(s"error_$t"))
    }
  }

  /** Attach per-topic success/error observation to a (topic, value) wire
    * stream (works on batch DataFrames too). The stream's rows pass
    * through unchanged.
    */
  def observed(wire: DataFrame, cfg: PipelineConfig = PipelineConfig.default,
               isError: Column = col("value").isNull || col("value") === ""): DataFrame = {
    val ms = metricCols(cfg, isError)
    wire.observe(observationName, ms.head, ms.tail: _*)
  }

  /** Batch form: one row per topic with success and error counts. */
  def deliveryStatsWithErrors(messages: DataFrame,
                              isError: Column = col("value").isNull || col("value") === ""): DataFrame =
    messages.groupBy(col("topic")).agg(
      count(when(!isError, lit(1))).as("n_success"),
      count(when(isError, lit(1))).as("n_errors"))

  /** Accumulates [[observed]] metrics across micro-batches into running
    * per-topic totals (`success_<topic>` / `error_<topic>`). Register via
    * `spark.streams.addListener`; read `snapshot` at any point.
    */
  final class DeliveryStatsListener extends StreamingQueryListener {
    private val totals = new ConcurrentHashMap[String, Long]()

    def snapshot: Map[String, Long] = totals.asScala.toMap

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val row = e.progress.observedMetrics.get(observationName)
      if (row != null) {
        row.schema.fieldNames.foreach { f =>
          val v = row.getAs[Long](f)
          totals.merge(f, v, (a, b) => a + b)
        }
      }
    }
  }
}
