package graft

import graft.functions.VectorFunctions.vec_sqdist_long
import org.apache.spark.sql.functions._

/** Native squared-L2 (functions.LongSqDist): pinned bit-identical to
  * the HOF composition it replaces, plus the NULL contracts (length
  * mismatch, null input) and negative-component arithmetic.
  */
class LongSqDistSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: String, b: String) = aggregate(
    zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
    lit(0L), (acc, x) => acc + x)

  test("native ≡ HOF composition on mixed-sign vectors") {
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(0L, -5L, 10L), Seq(3L, 5L, -10L)),
      (Seq(1000000L, -1000000L), Seq(-1000000L, 1000000L)),
      (Seq.empty[Long], Seq.empty[Long]))
    val out = rows.toDF("a", "b")
      .select(vec_sqdist_long(col("a"), col("b")).as("native"),
        hof("a", "b").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // spot values: (0-3)²+(-5-5)²+(10+10)² = 9+100+400
    assert(out(1).getLong(0) == 509L)
    assert(out(3).getLong(0) == 0L)
  }

  test("length mismatch and null inputs are NULL") {
    val out = Seq((Option(Seq(1L, 2L)), Option(Seq(1L))),
        (Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b")
      .select(vec_sqdist_long(col("a"), col("b")))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
