package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Skyline

/** The distributed running-max skyline vs the O(n²) dominance
  * definition, on adversarial point sets: heavy cost ties (so the
  * per-cost max reduction and the equal-cost RANGE frame both matter),
  * exact (cost, value) duplicates (weak dominance: all kept), and
  * bucket widths from degenerate (1 — every cost its own bucket,
  * everything rides the carry) to oversized (one bucket, everything
  * rides the in-bucket frame).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, c, v) =>
      !pts.exists { case (_, oc, ov) =>
        oc <= c && ov >= v && (oc < c || ov > v)
      }
    }.toSet

  for (width <- Seq(1L, 7L, 100L, 1000000L)) {
    test(s"skyline ≡ brute-force dominance (bucketWidth=$width)") {
      val raw = sample(Gen.listOfN(400,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(-50L, 50L))), width)
      val pts = raw.zipWithIndex.map { case ((c, v), i) => (i.toLong, c, v) }
      val got = Skyline.paretoFrontier2D(
          pts.toDF("id", "cost", "value"), "cost", "value", width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(pts))
    }
  }

  test("duplicate frontier points are all kept; columns pass through") {
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 20L, 5L), (4L, 5L, 1L))
    val got = Skyline.paretoFrontier2D(
        pts.toDF("id", "cost", "value"), "cost", "value", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (3) is dominated by (1)/(2) (higher cost, equal value); (4) is the
    // cheap low-value corner — on the frontier
    assert(got == Set((1L, 10L, 5L), (2L, 10L, 5L), (4L, 5L, 1L)))
  }

  test("frontier is monotone: values strictly increase with cost") {
    val raw = sample(Gen.listOfN(500,
      Gen.zip(Gen.chooseNum(0L, 10000L), Gen.chooseNum(0L, 10000L))), 7L)
    val pts = raw.zipWithIndex.map { case ((c, v), i) => (i.toLong, c, v) }
    val fr = Skyline.paretoFrontier2D(
        pts.toDF("id", "cost", "value"), "cost", "value", 64)
      .select("cost", "value").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    fr.sliding(2).foreach {
      case Array((c1, v1), (c2, v2)) => assert(c1 < c2 && v1 < v2)
      case _ =>
    }
  }
}
