package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Graph analytics beyond connected components: PageRank over the
  * symmetrized customer–supplier interaction graph. Iterative
  * rank-propagation is the canonical "joins as message passing"
  * workload — every round is one join (ranks → edges) + one aggregate
  * (sum incoming), both hashed on the node key, so rounds co-locate
  * and the graph never leaves its partitioning.
  *
  * Determinism: ranks live in integer micro-units (S = 1e12 total
  * mass) and every step is floor division on positive integers —
  * `r div deg` per-edge contribution, `(15·base + 85·Σin) div 100`
  * damping — so Spark and DuckDB agree bit-for-bit with no float
  * summation-order hazard. The undirected (symmetrized) edge set
  * guarantees degree ≥ 1 everywhere: no dangling-mass redistribution
  * term is needed.
  *
  * Scale: edges are built once and localCheckpoint'ed (every round
  * re-reads them); 3 unrolled rounds keep the lazy lineage linear.
  * At 100 TB the same shape holds — shuffle ∝ |edges| per round, state
  * ∝ |nodes|, rounds sequential as in any PageRank.
  */
object GraphQueries {

  /** Total rank mass in micro-units. */
  private val S = 1000000000000L

  val queries: Map[String, Q] = Map(
    "q_pagerank" -> ((s, d) => {
      val raw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      // repartition BEFORE the checkpoint: LogicalRDD preserves the
      // physical partitioning, so every round's ranks→edges join reuses
      // it instead of re-exchanging |edges| rows 3×
      val sc0 = s.sparkContext
      val beforeEdges = sc0.getPersistentRDDs.keySet
      val edges = raw
        .union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .localCheckpoint()
      val edgeRdds = (sc0.getPersistentRDDs -- beforeEdges).values.map { r =>
        r.setName("graft.pagerank edges"); r
      }
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      // 1-row node count, checkpointed once — it feeds every round's
      // damping term, and uncheckpointed each use would re-run the
      // degree aggregate over |edges|
      val n = deg.agg(count(lit(1)).as("n")).localCheckpoint()
      var rank = deg.crossJoin(broadcast(n))
        .select(col("node"), col("deg"), expr(s"$S div n").as("r"))
      // per-round release discipline (as in Bpe.merges / Dedup CC):
      // round N's rank snapshot dies once round N+1's materializes
      val sc = s.sparkContext
      var prevSnapRdds: Iterable[org.apache.spark.rdd.RDD[_]] = Nil
      for (round <- 1 to 3) {
        // ranks feed BOTH branches below (contribution join and the
        // carry-forward join) — checkpoint the |nodes|-sized table per
        // round or the lazy plan re-evaluates prior rounds 2× each
        // (exponential in rounds)
        val before = sc.getPersistentRDDs.keySet
        val snap = rank.localCheckpoint()
        val snapRdds = (sc.getPersistentRDDs -- before).values.map { r =>
          r.setName(s"graft.pagerank round $round"); r
        }
        prevSnapRdds.foreach(_.unpersist(blocking = false))
        prevSnapRdds = snapRdds
        val contrib = edges
          .join(snap.select(col("node"), expr("r div deg").as("c")),
            col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("c")).as("ins"))
        rank = snap.drop("r")
          .join(contrib, col("node") === col("dst")).drop("dst")
          .crossJoin(broadcast(n))
          .select(col("node"), col("deg"),
            expr(s"(15 * ($S div n) + 85 * ins) div 100").as("r"))
      }
      // materialize the final ranks, then release the last round's snap
      // AND the edge set — the returned frame reads only this checkpoint
      val result = rank.select(col("node"), col("r").as("pr")).localCheckpoint()
      (prevSnapRdds ++ edgeRdds).foreach(_.unpersist(blocking = false))
      result
    })
  )

  private def prRound(i: Int): String =
    s"""c$i AS (
       |  SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS ins
       |  FROM e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst
       |), r$i AS (
       |  SELECT p.node, p.deg,
       |    (15 * ($S // nn.n) + 85 * c.ins) // 100 AS r
       |  FROM r${i - 1} p JOIN c$i c USING (node), nn
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> {
      val rounds = (1 to 3).map(prRound).mkString(",\n")
      s"""WITH raw AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |), e AS (
         |  SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
         |), deg AS (
         |  SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src
         |), nn AS (
         |  SELECT COUNT(*) AS n FROM deg
         |), r0 AS (
         |  SELECT node, deg, $S // nn.n AS r FROM deg, nn
         |),
         |$rounds
         |SELECT node, r AS pr FROM r3""".stripMargin
    }
  )
}
