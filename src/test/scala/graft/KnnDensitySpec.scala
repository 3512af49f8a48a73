package graft

import graft.operators.Similarity

/** k-NN density outliers (Similarity.knnDensity): a hand-computed
  * line fixture where the query point is measurably sparser than its
  * own neighborhood, with the distance tie at the k-th rank broken by
  * candidate id exactly as documented. All components are exact binary
  * fractions so floor(x·1000) quantization is exact.
  */
class KnnDensitySpec extends SparkSpec {
  import spark.implicits._

  // quantized: q=[0,0], n1=[125,0], n2=[250,0], far=[750,0], off-axis
  // [0,750]. k=2: dk2(q)=62500 (via n2), neighbors {n1, n2};
  // dk2(n1)=15625 (tie 15625/15625 broken to cid 0 then 2),
  // dk2(n2)=62500 -> den=78125, num=125000, score=16000 bp
  private val emb = Seq(
    (0L, Array(0.0f, 0.0f)),
    (1L, Array(0.125f, 0.0f)),
    (2L, Array(0.25f, 0.0f)),
    (3L, Array(0.75f, 0.0f)),
    (4L, Array(0.0f, 0.75f))
  ).toDF("vec_id", "embedding")

  test("hand-computed density trace: query 1.6x sparser than neighborhood") {
    val rows = Similarity.knnDensity(emb, sampleMod = 100L, k = 2)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((0L, 62500L, 125000L, 78125L, 16000L)))
  }

  test("a dense point in its own cluster scores at or below par") {
    // make id 0 part of the tight cluster and push the sample's only
    // query into it: everything within the cluster has equal spacing
    val tight = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.125f, 0.0f)),
      (2L, Array(-0.125f, 0.0f)),
      (3L, Array(0.0f, 0.125f)),
      (4L, Array(0.0f, -0.125f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.knnDensity(tight, sampleMod = 100L, k = 2).collect()(0)
    // query's dk2 = 15625; both neighbors also have dk2 = 15625
    // (they see the center plus a 2*0.125-apart sibling... center first)
    assert(r.getLong(0) == 0L)
    assert(r.getLong(4) <= 10000L) // at or below par: not an outlier
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Similarity.knnDensity(emb, sampleMod = 100L, k = 0)
    }
  }
}
