package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.PipelineConfig
import graft.streaming.DeliveryAccounting

/** A4 delivery accounting: per-topic success AND error counters
  * (`producer/producer.py:44-58` parity) via observe() + listener.
  */
class DeliveryAccountingSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = PipelineConfig.default

  test("streaming listener accumulates per-topic success/error counts across batches") {
    val listener = new DeliveryAccounting.DeliveryStatsListener
    spark.streams.addListener(listener)
    try {
      val src = MemoryStream[(String, String)](spark)
      val wire = DeliveryAccounting.observed(
        src.toDF().toDF("topic", "value"), cfg)
      val q = wire.writeStream.format("noop").outputMode("append").start()

      // batch 1: two good cpu sends, one failing mem send (empty payload)
      src.addData((cfg.cpuTopic, "a,b"), (cfg.cpuTopic, "c,d"), (cfg.memTopic, ""))
      q.processAllAvailable()
      // batch 2: one more failing cpu send and a good disk send
      src.addData((cfg.cpuTopic, ""), (cfg.diskTopic, "x,y"))
      q.processAllAvailable()
      q.stop()

      val s = listener.snapshot
      assert(s(s"success_${cfg.cpuTopic}") == 2)
      assert(s(s"error_${cfg.cpuTopic}") == 1)
      assert(s(s"error_${cfg.memTopic}") == 1)
      assert(s(s"success_${cfg.memTopic}") == 0)
      assert(s(s"success_${cfg.diskTopic}") == 1)
      assert(s(s"error_${cfg.netTopic}") == 0)
    } finally spark.streams.removeListener(listener)
  }

  test("batch deliveryStatsWithErrors splits success and error per topic") {
    val msgs = Seq(
      (cfg.cpuTopic, "ok"), (cfg.cpuTopic, null), (cfg.memTopic, "ok"),
      (cfg.memTopic, "ok"), (cfg.netTopic, "")).toDF("topic", "value")
    val got = DeliveryAccounting.deliveryStatsWithErrors(msgs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(cfg.cpuTopic) == ((1L, 1L)))
    assert(got(cfg.memTopic) == ((2L, 0L)))
    assert(got(cfg.netTopic) == ((0L, 1L)))
  }
}
