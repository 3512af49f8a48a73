package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.AuditSink

/** The two custom connectors COMPOSED: the metricgen DataSource V2
  * streaming source feeds a stateless monitor-shaped transform into the
  * auditsink V2 write connector, the query is killed mid-corpus
  * (deterministically, via the source's endSec offset cap) and
  * restarted on the same checkpoint — end-to-end exactly-once means the
  * sink's commit accounting (row count AND layout-independent checksum)
  * equals a one-shot BATCH write of the same transform over the full
  * generated corpus. This is the integration proof the per-connector
  * specs (offset resume; per-epoch idempotence) imply but never
  * exercise together.
  */
class EndToEndExactlyOnceSpec extends SparkSpec {

  private def transform(df: DataFrame): DataFrame =
    df.select(col("server_id"), col("ts"),
      (col("cpu_pct") + col("mem_pct")).as("load"))

  test("metricgen → transform → auditsink is exactly-once across a restart") {
    AuditSink.clear("e2e"); AuditSink.clear("e2e_batch")
    val dir = java.nio.file.Files.createTempDirectory("e2e").toString

    def start(endSec: Option[Long]) = {
      val r = spark.readStream.format("metricgen")
        .option("rows", 20000).option("servers", 20)
        .option("rowsPerBatch", 500)
      endSec.foreach(e => r.option("endSec", e))
      transform(r.load())
        .writeStream.format("auditsink").option("channel", "e2e")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    }

    // run 1: offset range capped at the half-way grid slot — quiesces
    // mid-corpus with exactly 10000 rows committed
    val q1 = start(Some(2500))
    q1.processAllAvailable()
    q1.stop()
    val (midRows, _, _) = AuditSink.stats("e2e")
    assert(midRows == 10000L, s"mid-stream commit count $midRows")

    // run 2: same checkpoint, cap removed — resumes from the committed
    // offset and finishes the corpus
    val q2 = start(None)
    q2.processAllAvailable()
    q2.stop()

    // batch twin: the same transform over the full generated corpus
    transform(spark.read.format("metricgen")
        .option("rows", 20000).option("servers", 20).load())
      .write.format("auditsink").mode("append")
      .option("channel", "e2e_batch").save()

    val stream = AuditSink.stats("e2e")
    val batch = AuditSink.stats("e2e_batch")
    assert(stream == batch,
      s"stream $stream != batch $batch (rows, checksum-sum, checksum-xor)")
    // and no epoch double-counted: every positive commit is distinct
    val epochs = AuditSink.epochs("e2e").filter(_.rows > 0)
    assert(epochs.map(_.rows).sum == 20000L)
  }
}
