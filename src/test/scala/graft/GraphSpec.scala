package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphQueries

/** Invariants of the integer PageRank (the oracle proves cross-engine
  * agreement; this pins the rank semantics).
  */
class GraphSpec extends SparkSpec {

  test("pagerank conserves mass up to floor-division leakage; all positive") {
    val pr = GraphQueries.queries("q_pagerank")(spark, sf0001)
    val row = pr.agg(sum(col("pr")).as("total"), count(lit(1)).as("n"),
      min(col("pr")).as("lo")).collect().head
    val (total, n, lo) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val S = 1000000000000L
    // each of the 3 rounds loses < 1 unit per edge-contribution floor,
    // < 1 per damping floor, plus the initial S div n remainder —
    // bounded by a generous 4 units x (nodes + edges) total; never gains
    val edges = 2L * 160 * 160 // loose upper bound on |edges| at sf0.001
    assert(total <= S && total >= S - 4 * (n + edges))
    assert(lo > 0, "every connected node keeps positive rank")
  }

  test("pagerank gives higher rank to higher-degree nodes on average") {
    val pr = GraphQueries.queries("q_pagerank")(spark, sf0001)
    // suppliers serve many customers each (dense side) — their mean
    // rank must exceed the global uniform share
    val sup = pr.filter(col("node").startsWith("s"))
      .agg(avg(col("pr"))).collect().head.getDouble(0)
    val n = pr.count()
    assert(sup > 1000000000000L.toDouble / n)
  }

  test("triangleStats: K4 plus a pendant edge (known counts)") {
    import spark.implicits._
    // K4 on {1,2,3,4}: 6 edges, 4 triangles; pendant 4-5 adds 1 edge.
    // Oriented wedges of K4 = one per triangle's two lowest-ordered
    // edges... easier: verify the closed-form answers directly.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r = GraphQueries.triangleStats(und).collect().head
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    // every triangle is one closed wedge; K4's orientation yields
    // exactly C(out-deg,2) summed = 4 wedges closed + open ones from
    // the pendant-degree asymmetry — just sanity-bound it
    assert(r.getAs[Long]("n_wedges") >= 4L)
  }

  test("triangleStats: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    val und = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("u", "v")
    val r = GraphQueries.triangleStats(und).collect().head
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 0L)
  }

  test("kcorePeel: K4 with a pendant chain peels to exactly the K4") {
    import spark.implicits._
    // K4 on 1-4 (every node degree 3) + chain 4-5-6: 5 and 6 can never
    // reach degree 3, and once 6 peels, 5 drops to 1 and peels too
    val und = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toSeq ++ Seq((4L, 5L), (5L, 6L))
    val got = GraphQueries.kcorePeel(spark, und.toDF("u", "v"), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(spark.sparkContext.getPersistentRDDs.values
      .count(r => Option(r.name).exists(_.startsWith("graft.kcore edges"))) == 0,
      "intermediate round snapshots must be released")
  }

  test("kcorePeel: graph thinner than k everywhere peels to empty") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v") // a path
    assert(GraphQueries.kcorePeel(spark, und, k = 2, rounds = 3).count() == 0)
  }

  test("hitsScores: mass conserved per family; star graph concentrates authority") {
    import spark.implicits._
    // star: customers 1..4 all buy from supplier 10; customer 1 also
    // buys from supplier 11. Supplier 10 must dominate authority.
    val edges = Seq(("c1", "s10"), ("c2", "s10"), ("c3", "s10"),
      ("c4", "s10"), ("c1", "s11")).toDF("c", "s")
    val out = GraphQueries.hitsScores(spark, edges, rounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val S = 1000000000L
    for (kind <- Seq("hub", "auth")) {
      val scores = out.filter(_._1 == kind).map(_._3)
      assert(scores.forall(_ >= 0))
      // normalization: total mass = S up to floor loss (< 1 per node)
      assert(scores.sum <= S && scores.sum >= S - scores.length)
    }
    val auth = out.filter(_._1 == "auth").map(t => t._2 -> t._3).toMap
    assert(auth("s10") > 3 * auth("s11"))
    // c1 buys from both suppliers -> strongest hub
    val hub = out.filter(_._1 == "hub").map(t => t._2 -> t._3).toMap
    assert(hub("c1") == hub.values.max)
  }

  test("bfsHops: path graph distances from one seed, horizon capped") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus a disconnected edge 10-11; seed = node 0
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("u", "v")
    val got = GraphQueries.bfsHops(spark, und, col("node") === 0, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact hops up to 3; 4, 5 beyond horizon; 10, 11 unreachable
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("bfsHops: multi-source takes the MIN distance; cycle converges") {
    import spark.implicits._
    // cycle 1-2-3-4-1 with seeds {1, 3}: 2 and 4 are 1 hop from EITHER
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val got = GraphQueries.bfsHops(spark, und,
        col("node") === 1 || col("node") === 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    assert(spark.sparkContext.getPersistentRDDs.values
      .count(r => Option(r.name).exists(_.startsWith("graft.bfs edges"))) == 0,
      "edge checkpoint must be released")
  }
}
