package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The r14 LSH build/probe split must be VALUE-NEUTRAL: bucketedTopK
  * (which now delegates) must equal lshProbe over a separately built —
  * and persisted, like a real materialized index — lshBucketTable, for
  * the uncapped, capped, and multi-probe variants. Mirrors the r13
  * ivfCentroids/ivfAssign/ivfProbe split pinning in SimilaritySpec.
  */
class LshIndexSpec extends SparkSpec {

  private val dim = 8
  private def corpus = ScaleSweep.embCorpus(spark, 80, dim)
  private def queries = ScaleSweep.embCorpus(spark, 6, dim, idOffset = 500L)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("sim"), col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("inline bucketedTopK == lshProbe over a persisted bucket table (uncapped)") {
    val idx = Similarity.lshBucketTable(corpus, planes = 3).persist()
    try {
      idx.count()
      assert(rows(Similarity.lshProbe(idx, queries, 5, planes = 3)) ==
        rows(Similarity.bucketedTopK(corpus, queries, 5, planes = 3)))
    } finally { idx.unpersist(); () }
  }

  test("inline capped bucketedTopK == lshProbe over a persisted CAPPED table") {
    val idx = Similarity.lshBucketTable(corpus, planes = 3,
      maxBucketCandidates = Some(4)).persist()
    try {
      idx.count()
      // the cap keeps exactly the `cap` lowest-cand_id rows per bucket
      val perBucket = idx.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1))
      assert(perBucket.nonEmpty && perBucket.forall(_ <= 4))
      assert(rows(Similarity.lshProbe(idx, queries, 5, planes = 3)) ==
        rows(Similarity.bucketedTopK(corpus, queries, 5, planes = 3,
          maxBucketCandidates = Some(4))))
    } finally { idx.unpersist(); () }
  }

  test("multi-probe parity over the persisted table") {
    val idx = Similarity.lshBucketTable(corpus, planes = 3).persist()
    try {
      idx.count()
      val indexed = rows(Similarity.lshProbe(idx, queries, 5, planes = 3,
        multiProbe = true))
      assert(indexed ==
        rows(Similarity.bucketedTopK(corpus, queries, 5, planes = 3,
          multiProbe = true)))
      // multi-probe admits a superset of single-probe candidates, so
      // per-query result counts can only grow
      val single = rows(Similarity.lshProbe(idx, queries, 5, planes = 3))
      assert(single.groupBy(_._1).forall { case (q, rs) =>
        rs.size <= indexed.count(_._1 == q) })
    } finally { idx.unpersist(); () }
  }
}
