package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF index lifecycle (r15): incremental ingest (ivfUpsert) and
  * predicate-filtered probe (ivfProbeFiltered).
  *
  * The upsert contract: replace-by-id against a FIXED quantizer — an
  * ingested index must be indistinguishable from a full rebuild when
  * the re-ingested vectors are identical, and must carry the NEW
  * vector (with its recomputed list assignment) when they differ. The
  * filtered contract: the predicate prunes candidates BEFORE ranking,
  * so a predicate-sparse neighborhood still yields k survivors where
  * post-filtering a plain top-k does not.
  */
class IvfLifecycleSpec extends SparkSpec {

  private val dim = 8
  private def corpus = ScaleSweep.embCorpus(spark, 60, dim)
  private def queriesDf = ScaleSweep.embCorpus(spark, 5, dim, idOffset = 300L)

  private def indexRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Double], Long)] =
    df.select(col("cand_id").cast("long"), col("cv"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSet

  private def probeRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("sim"), col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("ingest of the missing slice + identical overlap == full build") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val base = Similarity.ivfAssign(corpus.filter(col("vec_id") % 5 =!= 0), cents)
    val delta = corpus.filter(col("vec_id") % 5 === 0 || col("vec_id") % 10 === 1)
    val full = Similarity.ivfAssign(corpus, cents)
    assert(indexRows(Similarity.ivfUpsert(base, cents, delta)) == indexRows(full))
    // and the non-broadcast anti-join path agrees
    assert(indexRows(Similarity.ivfUpsert(base, cents, delta,
      broadcastDelta = false)) == indexRows(full))
  }

  test("re-ingesting a CHANGED vector replaces it and re-assigns its list") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val idx = Similarity.ivfAssign(corpus, cents)
    // id 7 gets centroid 0's vector: latest wins, and its new nearest
    // list must be centroid 0's own (cosine 1 with itself).
    val cent0 = corpus.filter(col("vec_id") === 0).select(col("embedding"))
      .collect().head.getSeq[Double](0)
    val delta = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(7L, cent0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val up = Similarity.ivfUpsert(idx, cents, delta)
    assert(up.count() == idx.count())
    val row7 = up.filter(col("cand_id") === 7)
      .select(col("cv"), col("centroid_id")).collect().head
    assert(row7.getSeq[Double](0) == cent0)
    assert(row7.getLong(1) == 0L)
  }

  test("filtered probe returns only allowed ids, k deep; post-filter does not") {
    val cents = Similarity.ivfCentroids(corpus, nlist = 4)
    val listed = Similarity.ivfAssign(corpus, cents)
    val allowed = corpus.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val k = 5
    val filt = probeRows(Similarity.ivfProbeFiltered(listed, cents, queriesDf,
      allowed, k, nprobe = 2))
    assert(filt.forall { case (_, cand, _, _) => allowedIds(cand) })
    // pre-filter semantics: every query fills its k as long as its
    // probed lists hold >= k allowed candidates (they do here)
    val perQuery = filt.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.values.forall(_ == k))
    // the operator post-filtering replaces: plain top-k then predicate
    // — strictly fewer survivors for at least one query
    val post = probeRows(Similarity.ivfProbe(listed, cents, queriesDf, k,
        nprobe = 2))
      .filter { case (_, cand, _, _) => allowedIds(cand) }
    val postPerQuery = post.groupBy(_._1).view.mapValues(_.size).toMap
    assert(postPerQuery.values.exists(_ < k))
    // and the shuffle-path semi-join agrees with the broadcast path
    assert(probeRows(Similarity.ivfProbeFiltered(listed, cents, queriesDf,
      allowed, k, nprobe = 2, broadcastAllowed = false)) == filt)
  }
}
