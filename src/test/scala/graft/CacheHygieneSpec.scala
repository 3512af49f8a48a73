package graft

import graft.core.CacheScope

/** Cache-lifetime discipline (round-3 verdict item 8): catalog queries
  * that persist() intermediates must not leak cached tables into a
  * long-lived session once their result has been consumed.
  *
  * Two mechanisms under test:
  *  - CacheScope.releaseAfterUse — a QueryExecutionListener drops the
  *    operator's persisted intermediates right after the first action
  *    that consumes the returned frame (asynchronously, hence the
  *    polling asserts).
  *  - connectedComponents' per-round localCheckpoint blocks: every
  *    round but the last is dropped inside the loop; the final round is
  *    unrecomputable by design (lineage was truncated) and must survive
  *    until the harness declares the result dead via releaseStragglers.
  */
class CacheHygieneSpec extends SparkSpec {

  private def pinned = spark.sparkContext.getPersistentRDDs

  /** Poll until every pinned RDD satisfies `allowed` (listener delivery
    * is async). Returns the final pinned map for the failure message.
    */
  private def awaitOnly(allowed: org.apache.spark.rdd.RDD[_] => Boolean,
                        timeoutMs: Long = 30000) = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !pinned.values.forall(allowed))
      Thread.sleep(100)
    pinned.filter { case (_, r) => !allowed(r) }
  }

  private def describe(left: collection.Map[Int, org.apache.spark.rdd.RDD[_]]) =
    left.map { case (id, r) => s"$id:${Option(r.name).getOrElse(r.toString)}" }

  test("query-level persist is released after the consuming action") {
    CacheScope.releaseStragglers(spark)
    SparkEntry.queries("q_ngram_jaccard")(spark, sf0001).count()
    val left = awaitOnly(_ => false)
    assert(left.isEmpty, s"still pinned: ${describe(left)}")
  }

  test("operator-internal persists are released after the consuming action") {
    CacheScope.releaseStragglers(spark)
    SparkEntry.queries("q_dedup_minhash")(spark, sf0001).count()
    SparkEntry.queries("q_simhash_pairs")(spark, sf0001).count()
    val left = awaitOnly(_ => false)
    assert(left.isEmpty, s"still pinned: ${describe(left)}")
  }

  test("connected components retains only its final checkpoint") {
    CacheScope.releaseStragglers(spark)
    SparkEntry.queries("q_dedup_clusters")(spark, sf0001).count()
    // intermediate rounds, the edge cache, and the LSH profiles must all
    // be gone; the final round's (unrecomputable) checkpoint may remain
    val left = awaitOnly(r =>
      Option(r.name).exists(_.startsWith("graft.connectedComponents")))
    assert(left.isEmpty, s"still pinned beyond the final checkpoint: ${describe(left)}")
    CacheScope.releaseStragglers(spark)
    assert(pinned.isEmpty, s"releaseStragglers left: ${describe(pinned)}")
  }

  test("iterative queries retain only their output checkpoints") {
    CacheScope.releaseStragglers(spark)
    SparkEntry.queries("q_bpe_merges")(spark, sf0001).count()
    // per-round symbol snapshots are released inside the loop; the six
    // 1-row argmax checkpoints ARE the returned merge table and stay
    val leftB = awaitOnly(r =>
      !Option(r.name).exists(_.startsWith("graft.bpe round")))
    assert(leftB.isEmpty, s"dead BPE round blocks still pinned: ${describe(leftB)}")
    CacheScope.releaseStragglers(spark)

    SparkEntry.queries("q_pagerank")(spark, sf0001).count()
    // rank rounds and the edge set die with the final result checkpoint
    val leftP = awaitOnly(r =>
      !Option(r.name).exists(n => n.startsWith("graft.pagerank round") ||
        n.startsWith("graft.pagerank edges")))
    assert(leftP.isEmpty, s"dead PageRank blocks still pinned: ${describe(leftP)}")
    CacheScope.releaseStragglers(spark)
    assert(pinned.isEmpty, s"releaseStragglers left: ${describe(pinned)}")
  }

  test("full catalog sweep leaves no net cached tables") {
    CacheScope.releaseStragglers(spark)
    SparkEntry.queries.foreach { case (_, fn) =>
      fn(spark, sf0001).count()
      CacheScope.releaseStragglers(spark)
    }
    val left = awaitOnly(_ => false)
    assert(left.isEmpty, s"still pinned after full sweep: ${describe(left)}")
  }
}
