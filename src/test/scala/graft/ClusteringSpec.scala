package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight blobs far apart; seeds (the 2 lowest ids) land one per
    * blob, so one refinement must separate them perfectly.
    */
  test("kmeansRefine separates well-separated blobs after one pass") {
    val blobA = (0L until 5L).map(i => (i, Array.fill(4)(0.1f + i * 0.001f)))
    val blobB = (10L until 16L).map(i => (i, Array.fill(4)(0.9f + (i - 10) * 0.001f)))
    // seed ids are 0 and 1 — BOTH inside blob A: assignment 1 sends all
    // of blob B to the nearer seed (1), the recomputed mean of that
    // cluster moves toward B, and reassignment keeps the split stable
    val corpus = (blobA ++ blobB).toDF("vec_id", "embedding")
    val got = Clustering.kmeansRefine(corpus, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cluster 0 = blob A minus nothing (ids 0..4), cluster 1 = blob B + nothing?
    // membership is exact: every blob-B vector is closer to cluster 1's
    // refined mean than to cluster 0's
    val total = got.values.map(_._1).sum
    assert(total == 11L)
    assert(got.keySet == Set(0L, 1L))
    assert(got(1L)._2 >= 10L) // cluster 1 holds only blob-B ids after refinement
    assert(got(0L)._3 <= 4L)  // cluster 0 holds only blob-A ids
  }

  test("kmeansRefine is deterministic and id-rank seeded (sparse ids fine)") {
    // non-zero-based, sparse ids — seeds must be the k lowest BY RANK
    val corpus = Seq(
      (1000L, Array(0.0f, 0.0f)), (2000L, Array(0.01f, 0.01f)),
      (3000L, Array(1.0f, 1.0f)), (4000L, Array(0.99f, 1.01f)))
      .toDF("vec_id", "embedding")
    val a = Clustering.kmeansRefine(corpus, k = 2).collect().toSeq.sortBy(_.getLong(0))
    val b = Clustering.kmeansRefine(corpus, k = 2).collect().toSeq.sortBy(_.getLong(0))
    assert(a == b)
    val m = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1000L -> 2L, 2000L -> 2L)) // seeds 1000, 2000; all 4 split 2/2
  }
}
