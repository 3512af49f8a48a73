package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{JaroWinkler, JwBestMatch, JwMatches}

/** Record linkage / entity resolution: fuzzy-match records by a string
  * field after BLOCKING — the classic two-stage shape (block to bound
  * the candidate set, score only within blocks) that keeps fuzzy
  * matching off the O(n²) cliff at scale.
  *
  * No reference counterpart (the reference joins on exact keys only);
  * this is extension-tier, the entity-resolution step of a corpus
  * curation pipeline (merging crawl records by near-identical
  * titles/URLs before dedup proper).
  *
  * Scale: all cost lives in |block|² scoring, so the blocking key
  * choice IS the scale story — pick one with bounded block sizes
  * (brand, domain, sorted-neighborhood window, phonetic key). The
  * block self-join shuffles on the block key once; scoring is the
  * codegen'd [[graft.functions.JaroWinkler]] expression inside
  * whole-stage codegen, no UDF. A skewed block degrades quadratically:
  * audit block sizes first (`blockSizes`) — the same discipline as
  * Dedup's hot-bucket cap.
  */
object Linkage {

  /** Per-block record counts, descending — the pre-flight skew audit. */
  def blockSizes(records: DataFrame, blockCol: String): DataFrame =
    records.groupBy(col(blockCol)).agg(count(lit(1)).as("n_records"))
      .orderBy(col("n_records").desc, col(blockCol))

  /** Undirected candidate pairs within each block, scored: (a_id, b_id,
    * sim) with a_id < b_id. Use for threshold linkage (dedup-style).
    */
  def scoredPairs(records: DataFrame, idCol: String, nameCol: String,
                  blockCol: String): DataFrame = {
    val a = records.select(col(blockCol).as("_blk"), col(idCol).as("a_id"),
      col(nameCol).as("_a_name"))
    val b = records.select(col(blockCol).as("_blk"), col(idCol).as("b_id"),
      col(nameCol).as("_b_name"))
    a.join(b, Seq("_blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", JaroWinkler.of(col("_a_name"), col("_b_name")))
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Per-block candidate lists for the broadcast-kernel paths:
    * (block, array<struct<id, name>>). Small by the bounded-block
    * precondition; broadcast at the call sites.
    */
  private def candidateLists(records: DataFrame, idCol: String,
                             nameCol: String, blockCol: String): DataFrame =
    records.groupBy(col(blockCol).as("_blk"))
      .agg(collect_list(struct(col(idCol), col(nameCol))).as("_cands"))

  /** Threshold linkage: undirected pairs (a_id < b_id) scoring at or
    * above `threshold`.
    *
    * Broadcast-kernel plan: records join their block's broadcast
    * candidate list and [[graft.functions.JwMatches]] scans it inside
    * the expression — each undirected pair scored exactly once, and the
    * only materialized rows are the matches themselves (the join-based
    * form materializes all |block|² candidates AND re-evaluates the
    * similarity in both filter and project: measured 3.3 s → ~1 s at
    * sf0.1's 8M candidates, 311k matches). For unbounded blocks fall
    * back to `scoredPairs(...).filter(...)`.
    */
  def linkPairs(records: DataFrame, idCol: String, nameCol: String,
                blockCol: String, threshold: Double): DataFrame = {
    val cands = candidateLists(records, idCol, nameCol, blockCol)
    // repartition by id with an EXPLICIT partition count: the kernel is
    // CPU-bound (|block| similarity evals per row), and AQE's size-based
    // coalescing would collapse this byte-tiny exchange onto one core —
    // the classic compute-heavy-row blind spot. At scale this one
    // narrow-schema shuffle is noise next to the scan it feeds.
    records.select(col(blockCol).as("_blk"), col(idCol).as("a_id"),
        col(nameCol).as("_name"))
      .repartition(records.sparkSession.sparkContext.defaultParallelism,
        col("a_id"))
      .join(broadcast(cands), Seq("_blk"))
      .select(col("a_id"), explode(JwMatches.of(col("_name"), col("a_id"),
        col("_cands"), lit(threshold))).as("_m"))
      .select(col("a_id"), col("_m.b_id").as("b_id"), col("_m.sim").as("sim"))
  }

  /** Exact global rank in (nameCol, idCol) order WITHOUT the
    * single-partition window trap — [[graft.operators.Ranking.globalRank]]'s
    * scaffold for STRING keys: deterministic sampled name boundaries
    * bucket the rows (boundary choice affects only balance, never rank
    * values — the total order has the id tie-break), per-bucket windows
    * rank in parallel, a ≤|buckets|-row offset prefix broadcasts back.
    * NULL names are excluded. Ordering parity: Spark's default
    * UTF8_BINARY collation compares UTF-8 bytes — identical to DuckDB's
    * default VARCHAR order, non-ASCII included. (The driver-side
    * `.sorted` on the SAMPLED boundary names is UTF-16 code-unit order,
    * but boundaries affect only bucket balance, never rank values.)
    */
  def nameOrderIndex(records: DataFrame, idCol: String, nameCol: String,
                     buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"nameOrderIndex needs buckets >= 2, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val base = records.filter(col(nameCol).isNotNull)
    val n = math.max(1L, base.count())
    val fraction = math.min(1.0, buckets * 200.0 / n)
    val sampled = base.select(col(nameCol)).sample(fraction, seed = 42)
      .collect().map(_.getString(0)).sorted
    val step = math.max(1, sampled.length / buckets)
    val bounds = sampled.indices.collect {
      case i if i > 0 && i % step == 0 => sampled(i)
    }.distinct.toArray
    val order = Seq(col(nameCol), col(idCol))
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
    val pfx = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket = #bounds below the name, as a plain indicator-sum fold:
    // the array-HOF formulation (size(filter(lit(bounds), _ < name)))
    // trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when the lambda's
    // captured column crosses the window-prefix branch on a parquet
    // scan (Spark 4.1) — the fold is also codegen-friendlier
    val bucketExpr = bounds.foldLeft(lit(0L)) { (acc, bnd) =>
      acc + when(col(nameCol) > lit(bnd), 1L).otherwise(0L)
    }
    val bucketed = base.withColumn("__b", bucketExpr)
    val offsets = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .withColumn("__base", coalesce(sum(col("__n")).over(pfx), lit(0L)))
      .select(col("__b"), col("__base"))
    bucketed
      .withColumn("__lr", row_number().over(w).cast("long"))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("rn", col("__base") + col("__lr"))
      .drop("__b", "__lr", "__base")
  }

  /** Sorted-neighborhood linkage — the blocking-KEY-free ER stage: rank
    * all records by name (exact global order, parallel scaffold above),
    * pair each record with its next `window` neighbors in that order,
    * score, threshold. The classic answer when no bounded blocking key
    * exists: candidates per record = `window`, total pairs = n·window,
    * never n².
    *
    * The neighbor join is an EQUI-join: explode d ∈ [1, window] and
    * join rn_b = rn_a + d — w-fold expansion of one side, shuffle on
    * the rank (balanced by construction), no range-join machinery
    * needed. Output (a_id, b_id, sim) with a before b in name order.
    */
  def sortedNeighborhood(records: DataFrame, idCol: String, nameCol: String,
                         window: Int, threshold: Double): DataFrame = {
    require(window >= 1, // sequence(1, 0) would step BACKWARD to d=0:
      s"sortedNeighborhood needs window >= 1, got $window") // self-pairs
    // persist: the rank frame feeds BOTH join sides — without this the
    // per-bucket window sort and the offsets aggregation re-execute per
    // side (only the exchanges would be reused)
    val idx = nameOrderIndex(records, idCol, nameCol).persist()
    val a = idx.select(col("rn").as("rn_a"), col(idCol).as("a_id"),
        col(nameCol).as("_an"),
        explode(sequence(lit(1), lit(window))).as("_d"))
      .withColumn("rn_b", col("rn_a") + col("_d"))
    val b = idx.select(col("rn").as("rn_b"), col(idCol).as("b_id"),
      col(nameCol).as("_bn"))
    a.join(b, Seq("rn_b"))
      .withColumn("sim", JaroWinkler.of(col("_an"), col("_bn")))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Best match per record among all OTHER records of its block:
    * (id, match_id, match_sim), ties broken by highest match_id —
    * deterministic cross-engine because the similarity doubles are
    * bit-identical to the oracle's. Records alone in their block drop
    * out (no candidates).
    *
    * Broadcast-kernel plan via [[graft.functions.JwBestMatch]]: one
    * output row per record, argmax computed inside the block scan — no
    * |block|² row explosion, no aggregate (the join+max(struct) form
    * pushed |block|²·|blocks| rows through an ObjectHashAggregate whose
    * per-partition group count trips the sort-based fallback: 9.6 s vs
    * ~1 s at sf0.1). Same bounded-block broadcast precondition.
    */
  def bestMatch(records: DataFrame, idCol: String, nameCol: String,
                blockCol: String): DataFrame = {
    val cands = candidateLists(records, idCol, nameCol, blockCol)
    // same CPU-spreading fixed-count repartition as linkPairs
    records.select(col(blockCol).as("_blk"), col(idCol).as("id"),
        col(nameCol).as("_name"))
      .repartition(records.sparkSession.sparkContext.defaultParallelism,
        col("id"))
      .join(broadcast(cands), Seq("_blk"))
      .select(col("id"),
        JwBestMatch.of(col("_name"), col("id"), col("_cands")).as("_best"))
      .filter(col("_best").isNotNull)
      .select(col("id"), col("_best.match_id").as("match_id"),
        col("_best.match_sim").as("match_sim"))
  }
}
