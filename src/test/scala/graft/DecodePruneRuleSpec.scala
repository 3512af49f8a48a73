package graft

import org.apache.spark.sql.functions._
import graft.functions.PcmStats
import graft.plans.DecodePruneRule

/** Decode pruning (plans/DecodePruneRule): header-only extractions of
  * pcm_stats run on the O(chunks) twin; any expensive or whole-struct
  * use of the same payload disqualifies the rewrite.
  */
class DecodePruneRuleSpec extends SparkSpec {
  import spark.implicits._

  // rule registered on the shared session once; it is a no-op for
  // plans without pcm_stats, so other suites are unaffected
  spark.experimental.extraOptimizations =
    spark.experimental.extraOptimizations :+ DecodePruneRule

  // written to parquet so the payloads are NOT foldable literals —
  // otherwise constant folding collapses the whole plan to a
  // LocalRelation before the rewrite is observable
  private lazy val wavs = {
    val dir = java.nio.file.Files.createTempDirectory("wavs").toString
    Seq(
      (1L, PcmStats.wavBytes(16000, Array[Short](5, -7, 9))),
      (2L, PcmStats.wavBytes(8000, Array[Short](100, -100))),
      (3L, "not a wav".getBytes))
      .toDF("id", "payload").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("cheap-only extraction rewrites to the header twin") {
    val df = wavs.select(col("id"),
      PcmStats.pcmStats(col("payload")).getField("sample_rate").as("sr"),
      PcmStats.pcmStats(col("payload")).getField("n_samples").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("pcm_header_stats"), optimized)
    assert(!optimized.contains("pcm_stats("), optimized)
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 16000L, 3L), (2L, 8000L, 2L), (3L, -1L, -1L)))
  }

  test("an expensive field on the same payload disqualifies the rewrite") {
    val df = wavs.select(
      PcmStats.pcmStats(col("payload")).getField("sample_rate").as("sr"),
      PcmStats.pcmStats(col("payload")).getField("energy").as("e"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("pcm_header_stats"), optimized)
    assert(df.filter(col("e").isNotNull).count() == 2)
  }

  test("a bare whole-struct use disqualifies the rewrite") {
    val df = wavs.select(
      PcmStats.pcmStats(col("payload")).as("st"),
      PcmStats.pcmStats(col("payload")).getField("n_samples").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("pcm_header_stats"), optimized)
  }

  test("independent payloads rewrite independently") {
    val two = wavs.select(col("payload").as("a"),
      reverse(col("payload")).as("b"))
    val df = two.select(
      PcmStats.pcmStats(col("a")).getField("n_samples").as("na"),
      PcmStats.pcmStats(col("b")).getField("energy").as("eb"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // a: cheap-only → pruned; b: expensive → full decode stays
    assert(optimized.contains("pcm_header_stats"), optimized)
    assert(optimized.contains("pcm_stats("), optimized)
  }
}
