package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import graft.streaming.TwsOps

/** Fault-tolerance tier for the TWS state operators: a query is
  * STOPPED mid-stream and a NEW query instance is started on the same
  * checkpoint — the state (token buckets, SpaceSaving counters, the
  * erasure ledger) must come back from the RocksDB checkpoint, not
  * from recomputation, and the output must equal the uninterrupted
  * run's exactly (the batch-split specs only prove invariance WITHIN
  * one query instance; this proves the restore path). The restarted
  * runs go through the parquet FILE sink — the sink whose commit log
  * carries Structured Streaming's exactly-once contract — so the
  * equality check also proves no duplicated or lost batches across
  * the restart boundary. One case (SpaceSaving) exercises the
  * PLANNED-BUT-UNCOMMITTED batch path deterministically: query 1 runs
  * under Trigger.AvailableNow (commit log provably ends at phase 1),
  * then a batch-1 entry covering phase 2 is forged into the offsets
  * WAL — the exact on-disk state of a crash between offset-log and
  * commit-log writes — and the restart must re-execute that batch as
  * planned against restored state, exactly once.
  */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Run `plan` to a parquet sink with a kill/restart boundary between
    * the two feed phases.
    *
    * `commitBeforeKill = false` exercises the PLANNED-BUT-UNCOMMITTED
    * batch recovery path, deterministically: query 1 runs under
    * `Trigger.AvailableNow` over phase 1 only (AvailableNow pins its
    * end offset at start, so run 1's commit log PROVABLY ends at the
    * phase-1 offsets), then phase 2 is added and a batch-1 entry is
    * FORGED into the offsets WAL — batch 0's file with the source
    * offset advanced to phase 2's end, exactly the on-disk state a
    * query killed between its offset-log write and its commit-log
    * write leaves behind. The restart must honor the recovery
    * contract: re-execute batch 1 AS PLANNED from the logged offsets,
    * against restored state, landing each row exactly once. (The
    * original shape added phase 2 while query 1 was still
    * micro-batching — racy, usually committed before the kill; the
    * first r12 rewrite made it deterministic but degenerate, phase 2
    * arriving only after the kill like the `true` branch — this forge
    * is both deterministic AND the genuinely distinct WAL-replay
    * path.) AvailableNow is safe here because the false-branch
    * processors are timer-free — a watermark-timer case would need the
    * default trigger's no-data batches to flush.
    */
  private def runWithRestart(plan: DataFrame, tag: String,
      feed1: () => Unit, feed2: () => Any,
      commitBeforeKill: Boolean = true): Seq[org.apache.spark.sql.Row] = {
    val base = Files.createTempDirectory(s"ckptrestart_$tag")
    val out = s"$base/out"
    def start(availableNow: Boolean) = {
      val w = plan.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
      (if (availableNow)
        w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else w).start()
    }
    if (commitBeforeKill) {
      val q1 = start(availableNow = false)
      feed1()
      q1.processAllAvailable()
      q1.stop()
      feed2()
    } else {
      feed1() // before start: AvailableNow only sees data present at start
      val q1 = start(availableNow = true)
      q1.awaitTermination() // self-stops once the pinned offsets commit
      // MemoryStream.addData returns the new end offset; its json is
      // what the engine itself would have logged (reflective call —
      // the streaming Offset classes are private[sql])
      val end = feed2()
      val endJson =
        end.getClass.getMethod("json").invoke(end).asInstanceOf[String]
      // forge offsets/1 = offsets/0 (v1 header + metadata line intact)
      // with the single source-offset line advanced over phase 2: the
      // planned-but-uncommitted batch
      val offsets = base.resolve("ckpt").resolve("offsets")
      val b0 = new String(Files.readAllBytes(offsets.resolve("0")), "UTF-8")
      val forged = (b0.split("\n").toSeq.dropRight(1) :+ endJson)
        .mkString("\n")
      Files.write(offsets.resolve("1"), forged.getBytes("UTF-8"))
    }
    val q2 = start(availableNow = false)
    q2.processAllAvailable()
    q2.stop()
    spark.read.parquet(out).collect().toSeq
  }

  test("token bucket state survives a checkpoint restart") {
    val trace = Seq(
      ("a", 0L), ("a", 200000L), ("a", 400000L), ("a", 2400000L),
      ("a", 2500000L))
    // uninterrupted expectation from TokenBucketSpec's hand replay
    val expected = Seq(
      ("a", 0L, true, 1000000L), ("a", 200000L, true, 200000L),
      ("a", 400000L, false, 400000L), ("a", 2400000L, true, 1000000L),
      ("a", 2500000L, true, 100000L))
    val out = withRocksDb {
      val src = MemoryStream[(String, Long)](spark)
      runWithRestart(
        TwsOps.tokenBucketTws(src.toDS().toDF("k", "ts"), "k", "ts", 2L, 1L),
        "tb",
        () => src.addData(trace.take(3): _*),
        () => src.addData(trace.drop(3): _*))
    }
    // row 4 (refill clamps at cap, spend) is only correct if the
    // restarted bucket restored (utok=400000, lastUs=400000) — a
    // fresh bucket would start full and emit a different tokens_after
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
      r.getLong(3))).sortBy(_._2) == expected)
  }

  test("SpaceSaving counters survive a restart with an uncommitted batch") {
    val rows = Seq(
      ("g", 1L, "a"), ("g", 2L, "a"), ("g", 3L, "b"),
      ("g", 4L, "c"), ("g", 5L, "c"), ("g", 6L, "a"))
    // uninterrupted expectation from SpaceSavingStreamSpec's replay:
    // the phase-2 rows are correct ONLY against the restored counter
    // map {a:(2,0), b:(1,0)} — c must evict b inheriting error 1
    val expected = Seq(
      ("g", 1L, "a", 1L, 0L, null), ("g", 2L, "a", 2L, 0L, null),
      ("g", 3L, "b", 1L, 0L, null), ("g", 4L, "c", 2L, 1L, "b"),
      ("g", 5L, "c", 3L, 1L, null), ("g", 6L, "a", 3L, 0L, null))
    val out = withRocksDb {
      val src = MemoryStream[(String, Long, String)](spark)
      runWithRestart(
        TwsOps.spaceSavingTws(src.toDS().toDF("key", "t", "item"),
          "key", "t", "item", 2),
        "ss",
        () => src.addData(rows.take(3): _*),
        () => src.addData(rows.drop(3): _*),
        commitBeforeKill = false)
    }
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getString(5))).sortBy(_._2) == expected)
  }

  test("CUSUM prefix state survives a restart (running sum AND min)") {
    // drift k=2, threshold h=4; values chosen so the post-restart rows
    // depend on BOTH state longs: psum dips negative pre-kill (runMin
    // = -3 after x=1,0), so a restart that lost runMin (or reset psum)
    // would mis-place the alert at ts=4
    val rows = Seq(
      ("m", 1L, 1L), ("m", 2L, 0L), ("m", 3L, 7L), ("m", 4L, 6L))
    // replay: d = x-2 → psum: -1,-3,2,6; runMin: -1,-3,-3,-3;
    // S = psum - min(0, runMin): 0, 0, 5, 9; alerts at S >= 4
    val expected = Seq(
      ("m", 1L, 0L, false), ("m", 2L, 0L, false),
      ("m", 3L, 5L, true), ("m", 4L, 9L, true))
    val out = withRocksDb {
      val src = MemoryStream[(String, Long, Long)](spark)
      runWithRestart(
        TwsOps.cusumTws(src.toDS().toDF("key", "t", "x"), "key", "t", "x",
          driftK = 2L, threshH = 4L),
        "cusum",
        () => src.addData(rows.take(2): _*),
        () => src.addData(rows.drop(2): _*))
    }
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))).sortBy(_._2) == expected)
  }

  test("sessionizer state AND its timer registry survive a restart") {
    // key 1: opened pre-kill, EXTENDED post-restart — correct (start,
    // end, n) requires the restored session state; key 2: opened
    // pre-kill and never touched again — its close can only come from
    // the TIMER REGISTERED BEFORE THE KILL firing after the restart,
    // which isolates timer-registry restore from state restore
    val B = 1000L
    val out = withRocksDb {
      val src = MemoryStream[(Long, Long)](spark)
      runWithRestart(
        TwsOps.sessionsTws(
          src.toDS().toDF("user_id", "sec")
            .select(col("user_id"),
              expr("timestamp_seconds(sec)").as("ts")),
          "user_id", "ts", gapUs = 60L * 1000000,
          watermark = "10 seconds").toDF(),
        "sess",
        () => src.addData((1L, B), (1L, B + 30), (2L, B)),
        () => { src.addData((1L, B + 50))          // extend key 1
                src.addData((99L, B + 10000)) })   // watermark push
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet
    // EXACT equality, matching the other restart cases: key 99's own
    // session can never close (its timer exceeds the final watermark),
    // so any extra row means a replayed pre-kill batch or a stale
    // pre-extension timer leaking a premature close
    val want = Set(
      (1L, B * 1000000, (B + 50) * 1000000, 3L), // restored + extended
      (2L, B * 1000000, B * 1000000, 1L))        // closed by restored timer
    assert(got == want, s"got $got")
    assert(out.size == 2, s"duplicate emission: $out")
  }

  test("the erasure ledger survives a restart: post-restart arrivals drop") {
    val out = withRocksDb {
      val docs = MemoryStream[(Long, String)](spark)
      val tombs = MemoryStream[Long](spark)
      runWithRestart(
        TwsOps.erasureScreenTws(
          docs.toDS().toDF("doc_id", "payload"), "doc_id", "payload",
          tombs.toDS().toDF("id"), "id"),
        "er",
        // phase 1 keeps the tombstone and the docs on DISJOINT ids:
        // the two MemoryStreams feed a running query, so same-phase
        // batch assignment is racy (the same-batch race semantics are
        // ErasureStreamSpec's job) — this expectation must hold under
        // any interleaving
        () => { tombs.addData(1L); docs.addData(2L -> "v2") },
        () => docs.addData(1L -> "leak?", 2L -> "v2-again", 3L -> "v3"))
    }
    // the post-restart arrival of doc 1 must hit the RESTORED ledger,
    // and the pre-kill batch must not be duplicated by the second query
    assert(out.map(r => (r.getLong(0), r.getString(1))).sorted == Seq(
      2L -> "v2", 2L -> "v2-again", 3L -> "v3"))
  }
}
