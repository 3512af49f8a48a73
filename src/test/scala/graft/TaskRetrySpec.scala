package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kmv, TopKStruct}
import graft.sources.AuditSink

/** Injection flags live in a top-level object: local-mode tasks run in
  * the test JVM, so a static AtomicBoolean is visible to the task
  * thread and the `compareAndSet` guarantees the failure fires in
  * EXACTLY ONE task attempt — the retry (and every other task) sees a
  * clean iterator.
  */
object TaskRetryState {
  val aggFail = new AtomicBoolean(false)
  val sinkFail = new AtomicBoolean(false)

  /** Closures must resolve the flag THROUGH this object by name: an
    * AtomicBoolean captured directly would be java-serialized into the
    * task closure, giving every task attempt its own armed COPY (first
    * version of this spec did exactly that — all 8 tasks threw and the
    * job died). A name lookup deserializes to `TaskRetryState$.MODULE$`,
    * the one JVM singleton, so exactly one attempt wins the CAS.
    */
  def flag(name: String): AtomicBoolean =
    if (name == "agg") aggFail else sinkFail
}

/** Task-RETRY fault tier (r11 verdict item 3). CheckpointRestartSpec
  * proves QUERY-restart recovery; this proves the finer-grained failure
  * mode a 1000-executor cluster hits daily — a single task attempt dies
  * mid-partition and Spark re-runs just that task
  * (`spark.task.maxFailures`). The contract under test: an aborted
  * attempt's PARTIALS never reach a result —
  *
  *  - (a) a batch aggregation over TypedImperativeAggregates
  *    (TopKStruct + KMV — the object-buffer aggregates whose partials
  *    live in task-local heap until the partial-agg stage serializes
  *    them for the exchange): the attempt dies AFTER feeding ~half its
  *    partition into the partial aggregate, and the final result must
  *    still be bit-identical to an uninjected run;
  *  - (b) the AuditSink V2 commit protocol: the attempt dies after
  *    write()-ing ~half its rows into a DataWriter, Spark calls
  *    `DataWriter.abort()` on it (until now only exercised by a direct
  *    abort call in AuditSinkSpec), and the channel's committed
  *    rows/checksums must match a clean run exactly — no double count
  *    from the dead attempt, no missing rows from the retry.
  *
  * The injected exception is thrown MID-iterator (not before first
  * row) so the dying attempt has real partial state to leak; the armed
  * flag being consumed + the job succeeding is the proof a task failed
  * AND was retried (local[4, 2] allows exactly one failure per task —
  * a second would fail the job and the spec).
  *
  * Session note: local-mode retry count is fixed by the master string
  * (`local[cores, maxFailures]`), so this suite cannot share
  * SparkSpec's `local[4]` (maxFailures = 1 — any task failure kills
  * the job). It stops whatever session is active, runs on its own
  * `local[4, 2]` context, and stops it in afterAll so the next suite's
  * getOrCreate builds a fresh default session; suites execute
  * sequentially in the forked test JVM, so no live suite observes the
  * swap.
  */
class TaskRetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4, 2]")
      .appName("graft-taskretry")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }

  /** 8-partition long source; when `flag` is armed, one task attempt
    * throws after passing 100 rows downstream (into the partial
    * aggregate / the data writer — real partial state, not a clean
    * pre-first-row death).
    */
  private def source(flagName: Option[String]) = {
    import spark.implicits._
    val base = spark.range(0, 4000, 1, 8).as[Long]
    flagName match {
      case None => base
      case Some(name) => base.mapPartitions { it =>
        if (TaskRetryState.flag(name).compareAndSet(true, false)) {
          var n = 0
          it.map { x =>
            n += 1
            if (n == 100) throw new RuntimeException("injected task failure")
            x
          }
        } else it
      }
    }
  }

  private def aggregate(flag: Option[String]) =
    source(flag).toDF("id")
      .select((col("id") % 40).as("g"), col("id").as("v"),
        (col("id") * 7 % 1000).as("s"))
      .groupBy("g")
      .agg(
        TopKStruct.topK(struct(col("v"), col("s")), 3, true, false).as("top3"),
        Kmv.kmvSketch(xxhash64(col("v")), 16).as("sketch"),
        sum(col("v")).as("sv"))

  test("TypedImperativeAggregate results are bit-identical under a task retry") {
    val clean = aggregate(None).collect().map(_.toString).sorted

    TaskRetryState.aggFail.set(true)
    val flaky = aggregate(Some("agg"))
      .collect().map(_.toString).sorted
    // flag consumed = the exception WAS thrown inside a task attempt;
    // collect() returning = the job survived it, so the task retried
    assert(!TaskRetryState.aggFail.get(), "injection never fired")

    assert(flaky.toSeq == clean.toSeq)
    assert(clean.length == 40)
  }

  test("AuditSink commits exactly once under a task retry (abort kills partials)") {
    def writeTo(channel: String, flag: Option[String]): Unit =
      source(flag).toDF("v")
        .write.format("auditsink").mode("append")
        .option("channel", channel).save()

    AuditSink.clear("retry_clean")
    AuditSink.clear("retry_faulty")
    try {
      writeTo("retry_clean", None)

      TaskRetryState.sinkFail.set(true)
      writeTo("retry_faulty", Some("sink"))
      assert(!TaskRetryState.sinkFail.get(), "injection never fired")

      val clean = AuditSink.stats("retry_clean")
      val faulty = AuditSink.stats("retry_faulty")
      // the dying attempt had 99 rows of partial (rows, sum, xor) state;
      // if its DataWriter.abort() path leaked them into a commit message
      // the row count (and both checksums) would exceed the clean run's
      assert(faulty == clean)
      assert(faulty._1 == 4000L)
      // exactly one commit landed per channel (one batch write each)
      assert(AuditSink.epochs("retry_faulty").size == 1)
    } finally {
      AuditSink.clear("retry_clean")
      AuditSink.clear("retry_faulty")
    }
  }
}
