package graft

import graft.operators.Annotation

/** pass@k estimator (Annotation.passAtK): hand-computed combinatorics,
  * the n-c < k short-circuit to certainty, k > n exclusion, the
  * sample cap, and the constructor guards.
  */
class PassAtKSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Boolean)], ks: Seq[Int],
                  maxN: Int = 32): Map[Long, (Long, Long, Long)] = {
    val df = rows.toDF("task", "sid", "ok")
    Annotation.passAtK(df, "task", "sid", "ok", ks, maxN)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("hand-computed single task: n=4, c=2") {
    val rows = Seq((1L, 1L, true), (1L, 2L, false), (1L, 3L, true), (1L, 4L, false))
    // pass@1 = 1 - C(2,1)/C(4,1) = 1 - 2/4 = 1/2 -> 500000 ppm
    // pass@3 = 1 - C(2,3)/C(4,3); n-c=2 < 3 -> num=0 -> 1000000 ppm
    val out = run(rows, Seq(1, 3))
    assert(out(1L) == ((1L, 500000L, 500000L)))
    assert(out(3L) == ((1L, 1000000L, 1000000L)))
  }

  test("exact product form: n=5, c=2, k=2") {
    // 1 - (3*2)/(5*4) = 1 - 6/20 = 7/10 -> 700000 ppm
    val rows = (1L to 5L).map(i => (1L, i, i <= 2))
    assert(run(rows, Seq(2))(2L) == ((1L, 700000L, 700000L)))
  }

  test("c=0 gives 0, c=n gives 1000000") {
    val none = (1L to 4L).map(i => (1L, i, false))
    val all = (1L to 4L).map(i => (1L, i, true))
    assert(run(none, Seq(2))(2L)._3 == 0L)
    assert(run(all, Seq(2))(2L)._3 == 1000000L)
  }

  test("k > n tasks are excluded, mean averages over the rest") {
    // task 1: n=2 c=1 -> pass@2 = 1 - C(1,2)/C(2,2): n-c=1 < 2 -> 1000000
    // task 2: n=4 c=1 -> pass@2 = 1 - (3*2)/(4*3) = 1/2 -> 500000
    // task 3: n=1 -> excluded at k=2
    val rows = Seq((1L, 1L, true), (1L, 2L, false),
      (2L, 1L, true), (2L, 2L, false), (2L, 3L, false), (2L, 4L, false),
      (3L, 1L, true))
    val out = run(rows, Seq(2))
    assert(out(2L) == ((2L, 1500000L, 750000L)))
  }

  test("sample cap keeps the first maxN in sample-id order") {
    // 6 samples; ids 1..6, ok only on ids 5, 6. maxN=4 -> n=4, c=0.
    val rows = (1L to 6L).map(i => (1L, i, i >= 5))
    assert(run(rows, Seq(1), maxN = 4)(1L)._3 == 0L)
  }

  test("guards: k and maxN ranges") {
    val df = Seq((1L, 1L, true)).toDF("task", "sid", "ok")
    intercept[IllegalArgumentException] {
      Annotation.passAtK(df, "task", "sid", "ok", Seq(11))
    }
    intercept[IllegalArgumentException] {
      Annotation.passAtK(df, "task", "sid", "ok", Seq(1), maxN = 33)
    }
    intercept[IllegalArgumentException] {
      Annotation.passAtK(df, "task", "sid", "ok", Seq.empty)
    }
  }
}
