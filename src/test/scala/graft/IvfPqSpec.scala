package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF-PQ composed search (Similarity.ivfPqSearch — the IVFADC layout):
  * the list restriction must be EXACTLY a candidate filter over the
  * plain PQ-ADC ranking. Pinned invariants:
  *   - nprobe = nlist (probe every list) reproduces pqSearch row-for-row
  *     — same codes, same LUT, same tie rule, so the composed operator
  *     degenerates to the flat ADC scan when nothing is pruned;
  *   - with nprobe < nlist every returned (query, neighbor) pair's ADC
  *     distance agrees with the flat ranking's distance for that pair
  *     (the restriction changes WHICH candidates are scored, never the
  *     score), and every neighbor's list is among the query's probed
  *     lists;
  *   - determinism: two runs are bit-identical.
  */
class IvfPqSpec extends SparkSpec {

  private val dim = 16
  private def corpus = ScaleSweep.embCorpus(spark, 120, dim)
  private val queryPred = col("vec_id") % 20 === 0

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("adc_dist").cast("long"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("nprobe = nlist degenerates to the flat PQ-ADC ranking") {
    val flat = rows(Similarity.pqSearch(corpus, queryPred, k = 5,
      m = 4, nCent = 8))
    val full = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 6, m = 4, nCent = 8))
    assert(full == flat)
  }

  test("restricted probe scores agree with the flat ADC and respect probed lists") {
    val k = 5
    val restricted = Similarity.ivfPqSearch(corpus, queryPred, k = k,
      nlist = 6, nprobe = 2, m = 4, nCent = 8)
    // flat ADC over ALL candidates (k large enough to cover every pair)
    val flatAll = rows(Similarity.pqSearch(corpus, queryPred, k = 1000,
      m = 4, nCent = 8)).map(t => (t._1, t._2) -> t._3).toMap
    val got = rows(restricted)
    assert(got.nonEmpty)
    got.foreach { case (q, n, dist, _) =>
      assert(flatAll((q, n)) == dist,
        s"ADC distance for ($q,$n) diverged from the flat ranking")
    }
    // every neighbor's list must be among the query's nprobe=2 lists
    val cents = Similarity.ivfCentroids(corpus, 6)
    val assign = Similarity.ivfAssign(corpus, cents)
      .select(col("cand_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = corpus.filter(queryPred)
    val probed = Similarity.ivfProbe(
        Similarity.ivfAssign(corpus, cents), cents, q, k = 1000, nprobe = 2)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (qid, n, _, _) =>
      assert(probed.contains((qid, n)),
        s"neighbor $n of query $qid is outside the probed lists")
    }
    assert(assign.nonEmpty)
  }

  test("determinism: two runs bit-identical") {
    val a = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8))
    val b = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8))
    assert(a == b && a.nonEmpty)
  }
}
