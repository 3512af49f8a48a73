package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document clustering over embedding columns: one Lloyd (k-means)
  * refinement step in exact integer arithmetic.
  *
  * Training-data pipelines cluster embeddings for diversity sampling and
  * topic balancing. A full iterative k-means belongs to an ML library;
  * what the ENGINE must supply is the per-iteration dataflow — assign
  * every vector to its nearest centroid, recompute centroids, reassign —
  * with plans that scale: centroid tables are k·dim rows (broadcast),
  * vectors stream through dimension-exploded equi-joins, and nothing is
  * ever corpus×corpus.
  *
  * Determinism (and the DuckDB oracle) comes from integer arithmetic:
  * elements are quantized to a 1/`scale` grid (`floor(x·scale)` — exact
  * for float-origin data), so squared-L2 distances are exact BIGINTs and
  * argmin is unambiguous (ties break to the lowest centroid id). The
  * mean-centroid reassignment avoids fractional centroids entirely by
  * comparing n²·dist: Σ(n·q − S)² with S = Σ members, n = |members| —
  * still exact integers. With |x| ≤ ~1, scale = 1000, dim = 64 the worst
  * case is ~64·(2·n·scale)² ≈ 2.6e14 · (n/2000)² — safely inside Int64
  * for corpora partitioned into ≤ ~1e6-member clusters per reducer; at
  * larger n, drop `scale` a decade per ~30× member growth.
  */
object Clustering {

  /** One k-means refinement pass: seed k centroids (the k lowest-id
    * vectors, by rank — deterministic), assign, recompute means,
    * reassign; returns per-cluster membership accounting
    * (cluster_id = seed vector id; empty clusters yield no row).
    */
  def kmeansRefine(corpus: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   scale: Int = 1000): DataFrame = {
    // quantized dimension stream: one (id, pos, q) row per element —
    // the only corpus-sized relation; everything joined to it is O(k·dim)
    val q = corpus
      .select(col(idCol).as("vid"), posexplode(col(vecCol).cast("array<double>")))
      .select(col("vid"), col("pos"), floor(col("col") * scale).cast("long").as("qv"))
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cid"), posexplode(col(vecCol).cast("array<double>")))
      .select(col("cid"), col("pos"), floor(col("col") * scale).cast("long").as("qc"))
    // assignment 1: exact integer squared-L2 to each seed, argmin
    val assign1 = q.join(broadcast(seeds), Seq("pos"))
      .groupBy(col("vid"), col("cid"))
      .agg(sum((col("qv") - col("qc")) * (col("qv") - col("qc"))).as("dist"))
      .groupBy(col("vid"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("vid"), col("best.cid").as("cid"))
    // mean centroids as exact (sum, count) pairs per (cluster, dim)
    val sums = q.join(assign1, Seq("vid"))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
    // assignment 2 against fractional means without fractional state:
    // Σ(q − S/n)² == Σ(n·q − S)²/n², whose numerator is an exact BIGINT
    // (< 2^53, so the double cast is exact) and whose denominator n² is
    // exact — one deterministic IEEE division per (vector, cluster),
    // identical cross-engine; n is constant within a cluster, hence the
    // max(n) extraction.
    val assign2 = q.join(broadcast(sums), Seq("pos"))
      .groupBy(col("vid"), col("cid"))
      .agg((sum((col("n") * col("qv") - col("s")) * (col("n") * col("qv") - col("s")))
        .cast("double") / (max(col("n")) * max(col("n")))).as("dist"))
      .groupBy(col("vid"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("vid"), col("best.cid").as("cid"))
    assign2.groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("vid")).as("min_id"), max(col("vid")).as("max_id"))
  }
}
