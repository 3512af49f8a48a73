package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TwsOps

/** `transformWithState` operators (TwsOps) on the RocksDB state store
  * — these suites are also the sandbox's proof that the bundled
  * rocksdbjni native library loads and serves streaming state.
  *
  * The TTL topology (ProcessingTime mode) is a PERPETUAL SERVICE —
  * the engine keeps scheduling micro-batches so TTL can fire with no
  * new input (neither `processAllAvailable` nor `Trigger.AvailableNow`
  * ever quiesces; see the ttlDedup scaladoc) — so these tests run it
  * on a real trigger interval, poll the parquet sink, and `stop()`.
  * The restart test is the second RocksDB proof: the seen-set survives
  * a stop/start cycle through the checkpoint.
  */
class TwsOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Start the continuous ttlDedup service over `src` appending to
    * `dir/out` with its durable checkpoint at `dir/ckpt`.
    */
  private def startTtl(src: MemoryStream[(String, String)], dir: String,
                       ttl: java.time.Duration) =
    TwsOps.ttlDedup(
        src.toDS().toDF("h", "doc"), "h", "doc", ttl)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()

  private def readOut(dir: String): Seq[(String, String)] =
    try spark.read.parquet(s"$dir/out").as[(String, String)].collect().toSeq
    catch { case _: Exception => Nil } // sink dir not created yet

  /** Poll the sink until ≥ n rows land (their batch has committed). */
  private def awaitRows(dir: String, n: Int): Seq[(String, String)] = {
    val deadline = System.currentTimeMillis + 120000
    var got = readOut(dir)
    while (got.size < n && System.currentTimeMillis < deadline) {
      Thread.sleep(200); got = readOut(dir)
    }
    assert(got.size >= n, s"sink stuck at ${got.size}/$n rows: $got")
    got
  }

  test("ttlDedup: first arrival per key emits; in-batch and cross-restart dups drop") {
    withRocksDb {
      val dir = Files.createTempDirectory("tws-dedup").toString
      val src = MemoryStream[(String, String)](spark)
      val ttl = java.time.Duration.ofHours(1)
      // service run 1: A twice in one batch (in-batch dup), B once
      val q1 = startTtl(src, dir, ttl)
      try {
        src.addData(("a", "doc-a1"), ("a", "doc-a2"), ("b", "doc-b1"))
        awaitRows(dir, 2)
      } finally q1.stop()
      // service run 2 (same checkpoint): A again — the seen-set must
      // have survived the restart in RocksDB — plus new C
      val q2 = startTtl(src, dir, ttl)
      try {
        src.addData(("a", "doc-a3"), ("c", "doc-c1"))
        awaitRows(dir, 3)
      } finally q2.stop()
      val got = readOut(dir)
      assert(got.map(_._1).sorted == Seq("a", "b", "c"), got)
      // A's single emission came from run 1, not the redelivery
      assert(Set("doc-a1", "doc-a2").contains(got.find(_._1 == "a").get._2))
    }
  }

  test("ttlDedup: the seen-set self-expires — a key re-emits past the ttl") {
    withRocksDb {
      val dir = Files.createTempDirectory("tws-ttl").toString
      val src = MemoryStream[(String, String)](spark)
      // ONE continuous service run: expiry happens mid-flight, between
      // micro-batches — no restart involved. Sleeping past the ttl
      // only ever OVERSHOOTS on a stalled sandbox: extra elapsed time
      // is in the asserted direction.
      val q = startTtl(src, dir, java.time.Duration.ofMillis(400))
      try {
        src.addData(("a", "doc-a1"))
        awaitRows(dir, 1)
        Thread.sleep(1500)
        src.addData(("a", "doc-a2"))
        val got = awaitRows(dir, 2)
        assert(got.sorted == Seq(("a", "doc-a1"), ("a", "doc-a2")), got)
      } finally q.stop()
    }
  }

  private val gapUs = 60L * 1000000
  private val B = 1000L // see SessionTimeoutStreamSpec: epoch-0 ties the initial watermark

  test("sessionsTws equals the fMGWS twin: in-stream close + timer close") {
    // the SessionTimeoutStreamSpec scenario, replayed through the
    // timer-registry processor — same expected set. EventTime mode
    // quiesces once the watermark stops moving, so the memory-sink +
    // processAllAvailable harness applies as-is.
    withRocksDb {
      val src = MemoryStream[(Long, Long)](spark)
      val q = TwsOps.sessionsTws(
          src.toDS().toDF("user_id", "sec")
            .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts")),
          "user_id", "ts", gapUs, "10 seconds")
        .writeStream.format("memory").queryName("tws_sess")
        .outputMode("append").start()
      src.addData((1L, B), (1L, B + 30), (1L, B + 50), (2L, B))
      q.processAllAvailable()
      // key 1's +300s event closes its first session in-stream and
      // re-arms key 1's close timer (the stale one must be deleted)
      src.addData((1L, B + 300), (1L, B + 310))
      q.processAllAvailable()
      src.addData((99L, 10000L)) // watermark push: fire remaining timers
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_sess")
        .select(col("key"), col("session_start_us"), col("session_end_us"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = Set(
        (1L, B * 1000000, (B + 50) * 1000000, 3L),
        (1L, (B + 300) * 1000000, (B + 310) * 1000000, 2L),
        (2L, B * 1000000, B * 1000000, 1L))
      assert(got.intersect(want) == want, s"got $got")
    }
  }

  test("sessionsTws: in-gap stray extends start backward, far stray emits alone") {
    withRocksDb {
      val src = MemoryStream[(Long, Long)](spark)
      val q = TwsOps.sessionsTws(
          src.toDS().toDF("user_id", "sec")
            .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts")),
          "user_id", "ts", gapUs, "30 minutes")
        .writeStream.format("memory").queryName("tws_stray")
        .outputMode("append").start()
      src.addData((5L, B + 600)); q.processAllAvailable()
      src.addData((5L, B + 570), (5L, B + 300)); q.processAllAvailable()
      src.addData((99L, B + 10000)); q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_stray")
        .filter(col("key") === 5L)
        .select(col("session_start_us"), col("session_end_us"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        ((B + 300) * 1000000, (B + 300) * 1000000, 1L),
        ((B + 570) * 1000000, (B + 600) * 1000000, 2L)), s"got $got")
    }
  }

  test("transformWithState refuses the default HDFS-backed provider") {
    // the RocksDB requirement is real, not folklore: the same topology
    // without useRocksDb must fail with the store named in the chain
    val dir = Files.createTempDirectory("tws-wrongstore").toString
    val src = MemoryStream[(String, String)](spark)
    src.addData(("a", "x"))
    val err = intercept[Exception] {
      val q = startTtl(src, dir, java.time.Duration.ofHours(1))
      try q.processAllAvailable() // rethrows the stream's failure
      finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(err).exists(m => m.toLowerCase.contains("rocksdb") ||
      m.contains("STATE_STORE")), chain(err).mkString(" | "))
  }
}
