package graft

import graft.operators.Annotation

/** DPO preference-pair construction (Annotation.dpoPairs): extreme
  * picking with deterministic smaller-id tie-breaks on both sides,
  * the no-strict-preference and single-response skips, and the margin.
  */
class DpoPairsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    Annotation.dpoPairs(rows.toDF("p", "rid", "rw"), "p", "rid", "rw")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("chosen is max reward, rejected is min, margin exact") {
    val out = run(Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L)))
    assert(out(1L) == ((3L, 11L, 9L, 12L, 2L, 7L)))
  }

  test("reward ties break to the smaller response id on both sides") {
    // max reward 9 shared by ids 20, 21 -> chosen 20
    // min reward 2 shared by ids 30, 31 -> rejected 30
    val out = run(Seq((1L, 21L, 9L), (1L, 20L, 9L), (1L, 31L, 2L), (1L, 30L, 2L)))
    assert(out(1L) == ((4L, 20L, 9L, 30L, 2L, 7L)))
  }

  test("prompts with one response or no strict preference emit nothing") {
    val out = run(Seq(
      (1L, 10L, 5L),                 // single response
      (2L, 20L, 7L), (2L, 21L, 7L),  // all equal rewards
      (3L, 30L, 4L), (3L, 31L, 6L))) // real pair
    assert(out.keySet == Set(3L))
    assert(out(3L) == ((2L, 31L, 6L, 30L, 4L, 2L)))
  }
}
