package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** The DP release mechanism's contract: per-group seeded noise that is
  * deterministic (idempotent publication), bounded, sensitivity-true,
  * and rotated by salt.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("en", "a", 1.0), ("en", "a", 2.0), ("en", "b", 3.0),
    ("de", "a", 4.0), ("de", "a", 250.0) // 250 clips at 100.00
  ).toDF("lang", "src", "v")

  test("release is deterministic: same data + salt => identical noise") {
    val a = Privacy.dpCounts(rows, Seq("lang", "src"), "s1").collect().toSet
    val b = Privacy.dpCounts(rows, Seq("lang", "src"), "s1").collect().toSet
    assert(a == b)
  }

  test("noise is bounded by the binomial support: |count - noisy| <= 30") {
    val noisy = Privacy.dpCounts(rows, Seq("lang", "src"), "s1")
    val truth = rows.groupBy("lang", "src").agg(count(lit(1)).as("n"))
    val joined = noisy.join(truth, Seq("lang", "src"))
      .select(abs(col("noisy_count") - col("n")).as("d"))
      .as[Long].collect()
    assert(joined.forall(_ <= 30))
  }

  test("sensitivity 1: one extra record moves its group's release by exactly 1") {
    val plus = rows.unionByName(Seq(("en", "a", 9.0)).toDF("lang", "src", "v"))
    val before = Privacy.dpCounts(rows, Seq("lang", "src"), "s1")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val after = Privacy.dpCounts(plus, Seq("lang", "src"), "s1")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(after(("en", "a")) == before(("en", "a")) + 1)
    assert(after.filterKeys(_ != ("en", "a")).toMap ==
      before.filterKeys(_ != ("en", "a")).toMap)
  }

  test("salt rotation redraws the noise") {
    val s1 = Privacy.dpCounts(rows, Seq("lang", "src"), "s1")
      .agg(sum("noisy_count")).as[Long].head()
    val salts = (2 to 9).map { i =>
      Privacy.dpCounts(rows, Seq("lang", "src"), s"s$i")
        .agg(sum("noisy_count")).as[Long].head()
    }
    assert((s1 +: salts).distinct.size > 1) // some salt must change some draw
  }

  test("dpSum clips contributions: an outlier moves the release at most by the clip width") {
    val base = Seq(("en", 1.0)).toDF("lang", "v")
    val spiked = Seq(("en", 1.0), ("en", 1e12)).toDF("lang", "v")
    val a = Privacy.dpSumQuantized(base, Seq("lang"), "v", 0L, 10000L, 100L, "s")
      .as[(String, Long)].head()._2
    val b = Privacy.dpSumQuantized(spiked, Seq("lang"), "v", 0L, 10000L, 100L, "s")
      .as[(String, Long)].head()._2
    assert(b - a == 10000L) // clipped to exactly the sensitivity bound
  }

  test("dpSum sensitivity with a non-straddling clip range is max(|lo|,|hi|), not the width") {
    // With NULLs contributing 0, the per-record contribution set for
    // clip [50, 100] is {0} ∪ [50, 100]: removing one record can move
    // the sum by up to 100, so noise must scale by 100 — every residual
    // (release − true clipped sum) is a multiple of 100, and across salt
    // rotations at least one draw is odd (i.e. NOT a multiple of the
    // width-scaled 50 alone).
    val data = Seq(("en", 60.0), ("en", 70.0), ("de", 80.0))
      .toDF("lang", "v")
    val truth = data.groupBy("lang")
      .agg(sum(greatest(lit(50L), least(lit(100L),
        floor(col("v")).cast("long")))).as("t"))
    val residuals = (1 to 8).flatMap { i =>
      Privacy.dpSumQuantized(data, Seq("lang"), "v", 50L, 100L, 1L, s"s$i")
        .join(truth, Seq("lang"))
        .select((col("noisy_sum_q") - col("t")).as("r")).as[Long].collect()
    }
    assert(residuals.forall(_ % 100L == 0L))
    assert(residuals.exists(r => (r / 100L) % 2L != 0L))
  }
}
