package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Streaming IVF probe (Similarity.ivfProbeStream): a stream of query
  * vectors against a persisted ivfAssign index must emit EXACTLY the
  * batch ivfProbe rows — across micro-batch splits, because the
  * operator is stateless by construction (every cross-row step of the
  * probe is restructured in-row; no state store, no watermark).
  */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def corpus = ScaleSweep.embCorpus(spark, 60, dim)
  private def queriesDf = ScaleSweep.embCorpus(spark, 5, dim, idOffset = 300L)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("sim"), col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("stream probe == batch ivfProbe across micro-batch splits") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val groups = Similarity.ivfListGroups(listed).persist()
    try {
      groups.count()
      val qVecs = queriesDf.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val src = MemoryStream[(Long, Seq[Double])](spark)
      val q = Similarity.ivfProbeStream(groups, cents,
          src.toDS().toDF("vec_id", "embedding"), k = 5, nprobe = 2)
        .writeStream.format("memory").queryName("ann_probe")
        .outputMode("append").start()
      src.addData(qVecs.take(2): _*); q.processAllAvailable()
      src.addData(qVecs.drop(2): _*); q.processAllAvailable()
      q.stop()

      val want = rows(Similarity.ivfProbe(listed, cents, queriesDf,
        k = 5, nprobe = 2))
      assert(want.nonEmpty)
      assert(rows(spark.table("ann_probe")) == want)
    } finally { groups.unpersist(); () }
  }

  test("same operator on a BATCH query frame matches ivfProbe too") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val groups = Similarity.ivfListGroups(listed)
    assert(rows(Similarity.ivfProbeStream(groups, cents, queriesDf,
        k = 5, nprobe = 2)) ==
      rows(Similarity.ivfProbe(listed, cents, queriesDf, k = 5, nprobe = 2)))
  }

  test("SHARDED stream probe == batch ivfProbe across micro-batch splits (no broadcast)") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val sharded = Similarity.ivfShardedIndex(
      Similarity.ivfListGroups(listed), shards = 8).persist()
    try {
      sharded.count()
      val qVecs = queriesDf.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val src = MemoryStream[(Long, Seq[Double])](spark)
      val q = Similarity.ivfProbeStreamSharded(sharded, cents,
          src.toDS().toDF("vec_id", "embedding"), k = 5, nprobe = 2)
        .writeStream.format("memory").queryName("ann_probe_sharded")
        .outputMode("append").start()
      src.addData(qVecs.take(2): _*); q.processAllAvailable()
      src.addData(qVecs.drop(2): _*); q.processAllAvailable()
      q.stop()

      val want = rows(Similarity.ivfProbe(listed, cents, queriesDf,
        k = 5, nprobe = 2))
      assert(want.nonEmpty)
      assert(rows(spark.table("ann_probe_sharded")) == want)
      // the sharded plan must carry NO broadcast of the index: every
      // per-probe join is a ShuffledHashJoin building on the cached
      // co-partitioned shard, never a BroadcastHashJoin. (Raw
      // BroadcastExchange counts would also see the index's own cached
      // BUILD plan — ivfAssign's centroid broadcast — stored inside
      // the InMemoryRelation text; only probe-time joins matter here.)
      val plan = Similarity.ivfProbeStreamSharded(sharded, cents,
        queriesDf, k = 5, nprobe = 2).queryExecution.executedPlan.toString
      val shj = "ShuffledHashJoin".r.findAllIn(plan).size
      assert(shj >= 2 && !plan.contains("BroadcastHashJoin"),
        s"sharded probe joins not shuffle-hash over the cached shards:\n$plan")
    } finally { sharded.unpersist(); () }
  }

  test("sharded == unsharded on a batch frame, incl. nprobe past nlist") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val groups = Similarity.ivfListGroups(listed)
    val sharded = Similarity.ivfShardedIndex(groups)
    for (np <- Seq(2, 6))
      assert(rows(Similarity.ivfProbeStreamSharded(sharded, cents, queriesDf,
          k = 5, nprobe = np)) ==
        rows(Similarity.ivfProbeStream(groups, cents, queriesDf,
          k = 5, nprobe = np)), s"nprobe=$np diverged")
  }

  test("nprobe past nlist probes every list on both paths (guarded element_at)") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val groups = Similarity.ivfListGroups(listed)
    // nprobe = 6 > nlist = 4: the stream form's probe slots 5 and 6 hit
    // the size() guard (NULL key -> no match on the left join) instead
    // of an ANSI element_at throw; the batch form's rn <= 6 admits all
    // 4 centroids — both degrade to an exact full scan, identically.
    assert(rows(Similarity.ivfProbeStream(groups, cents, queriesDf,
        k = 5, nprobe = 6)) ==
      rows(Similarity.ivfProbe(listed, cents, queriesDf, k = 5, nprobe = 6)))
  }
}
