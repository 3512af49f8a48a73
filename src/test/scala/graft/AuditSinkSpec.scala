package graft.sources

import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The auditsink write connector: V2 commit protocol end to end —
  * counts/checksums arrive only via committed tasks, the streaming
  * commit is idempotent per epoch, and aborted partials never land.
  */
class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  test("batch write: rows + checksum recorded; checksum is layout-independent") {
    AuditSink.clear("b1"); AuditSink.clear("b2"); AuditSink.clear("b3")
    val df = spark.range(1000).select(col("id"),
      concat(lit("doc-"), col("id")).as("doc"))
    df.repartition(7).write.format("auditsink").mode("append").option("channel", "b1").save()
    // same relation, different partitioning/order → identical checksum
    df.repartition(3, col("doc")).sortWithinPartitions(desc("id"))
      .write.format("auditsink").mode("append").option("channel", "b2").save()
    // different relation → different checksum
    spark.range(1000).select(col("id"), concat(lit("doc-"), col("id") + 1).as("doc"))
      .repartition(7).write.format("auditsink").mode("append").option("channel", "b3").save()

    val (n1, s1, x1) = AuditSink.stats("b1")
    assert(n1 == 1000)
    assert(AuditSink.stats("b2") == ((n1, s1, x1)))
    val (n3, s3, x3) = AuditSink.stats("b3")
    assert(n3 == 1000 && (s3 != s1 || x3 != x1))

    // a SECOND batch write to the same channel accumulates (only
    // streaming epochs carry replay-idempotence)
    df.write.format("auditsink").mode("append").option("channel", "b1").save()
    assert(AuditSink.stats("b1")._1 == 2000)
    assert(AuditSink.epochs("b1").size == 2)
  }

  test("streaming write: per-epoch commits; totals equal the batch write of the same rows") {
    AuditSink.clear("s1"); AuditSink.clear("s1b")
    val src = MemoryStream[Long](spark)
    val q = src.toDS().select(col("value").as("id"),
        concat(lit("doc-"), col("value")).as("doc"))
      .writeStream.format("auditsink").option("channel", "s1")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("audit-ckpt").toString)
      .outputMode("append").start()
    src.addData(0L until 600: _*); q.processAllAvailable()
    src.addData(600L until 1000: _*); q.processAllAvailable()
    q.stop()

    val epochs = AuditSink.epochs("s1").filter(_.rows > 0)
    assert(epochs.map(_.rows).sum == 1000, epochs)
    assert(epochs.size == 2, epochs) // one commit per data micro-batch

    spark.range(1000).select(col("id"), concat(lit("doc-"), col("id")).as("doc"))
      .write.format("auditsink").mode("append").option("channel", "s1b").save()
    val (bn, bs, bx) = AuditSink.stats("s1b")
    assert(AuditSink.stats("s1") == ((bn, bs, bx))) // stream ≡ batch checksum
  }

  test("SQL DDL surface: INSERT INTO a USING-auditsink table records the commit") {
    AuditSink.clear("sql")
    spark.sql("DROP TABLE IF EXISTS audit_sql")
    spark.sql(
      """CREATE TABLE audit_sql (id BIGINT, doc STRING)
        |USING auditsink OPTIONS (channel 'sql')""".stripMargin)
    try {
      spark.sql(
        "INSERT INTO audit_sql SELECT id, 'doc-' || id FROM range(500)")
      assert(AuditSink.stats("sql")._1 == 500)
    } finally spark.sql("DROP TABLE IF EXISTS audit_sql")
  }

  test("a replayed epoch commit is idempotent; a different query run counts") {
    AuditSink.clear("replay")
    val w = new AuditStreamingWrite("replay", "run-a")
    val msgs: Array[WriterCommitMessage] = Array(AuditTaskTotals(10, 111, 7))
    w.commit(5, msgs)
    w.commit(5, msgs) // Spark re-commits the last epoch after recovery
    val (n, s, x) = AuditSink.stats("replay")
    assert((n, s, x) == ((10L, 111L, 7L)))
    assert(AuditSink.epochs("replay").size == 1)
    // epoch ids restart at 0 per query run: a DIFFERENT run hitting
    // the same channel+epoch is new data, not a replay
    new AuditStreamingWrite("replay", "run-b").commit(5, msgs)
    assert(AuditSink.stats("replay")._1 == 20)
  }

  test("aborted task partials never reach the driver") {
    AuditSink.clear("abort")
    val writer = new AuditWriterFactory().createWriter(0, 0L)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](1L))
    writer.write(row); writer.write(row)
    writer.abort() // task failed: its totals are dropped at the task
    assert(writer.commit() == AuditTaskTotals(0, 0, 0))
    // and a batch commit carrying only healthy tasks records only them
    val bw = new AuditBatchWrite("abort")
    bw.commit(Array(AuditTaskTotals(3, 30, 1)))
    assert(AuditSink.stats("abort")._1 == 3)
  }
}
