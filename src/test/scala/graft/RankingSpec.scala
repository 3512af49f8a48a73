package graft

import graft.operators.Ranking

/** Bradley-Terry sanity on planted tournaments: transitive dominance
  * must order the ratings, an all-losses player floors at 1 µ-unit,
  * and the fixed-round iteration is deterministic.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def ratings(matches: Seq[(Long, Long)]): Map[Long, Long] =
    Ranking.bradleyTerry(matches.toDF("winner", "loser"), "winner", "loser", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive dominance orders the ratings") {
    // a beats b 3-1, b beats c 3-1, a beats c 3-0
    val m = Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(3)((2L, 3L)) ++ Seq((3L, 2L)) ++ Seq.fill(3)((1L, 3L))
    val r = ratings(m)
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("all-losses player floors at 1 micro-unit") {
    val r = ratings(Seq((1L, 2L), (1L, 2L)))
    assert(r(2L) === 1L)
    assert(r(1L) > 1000000L)
  }

  test("deterministic across runs") {
    val m = (1 to 40).map(i => ((i % 7).toLong, (i % 5 + 7).toLong))
    assert(ratings(m) === ratings(m))
  }
}
