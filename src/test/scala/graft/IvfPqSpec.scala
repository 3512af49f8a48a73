package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF-PQ composed search (Similarity.ivfPqSearch — the IVFADC layout,
  * cosine-ADC scored): the list restriction must be EXACTLY a candidate
  * filter over the flat cosine-ADC ranking. Pinned invariants:
  *   - nlist = 1 (one list, probe it) and nprobe = nlist (probe every
  *     list) are both the unpruned scan, so they must agree
  *     row-for-row — the degenerate forms bracket the pruned one;
  *   - with nprobe < nlist every returned (query, neighbor) pair's
  *     adc_sim agrees bit-for-bit with the flat ranking's score for
  *     that pair (the restriction changes WHICH candidates are scored,
  *     never the score — integer LUT sums are order-independent, the
  *     one IEEE division is deterministic), and every neighbor's list
  *     is among the query's probed lists;
  *   - adc_sim is a true cosine of quantized vectors (Cauchy-Schwarz
  *     on exact integers): |adc_sim| ≤ 1 always;
  *   - determinism: two runs are bit-identical.
  */
class IvfPqSpec extends SparkSpec {

  private val dim = 16
  private def corpus = ScaleSweep.embCorpus(spark, 120, dim)
  private val queryPred = col("vec_id") % 20 === 0

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("adc_sim"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("nlist=1 flat scan == nprobe=nlist full probe, and |adc_sim| <= 1") {
    val flat = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 1, nprobe = 1, m = 4, nCent = 8))
    val full = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 6, m = 4, nCent = 8))
    assert(full == flat && flat.nonEmpty)
    flat.foreach { case (_, _, sim, _) =>
      assert(math.abs(sim) <= 1.0, s"adc_sim $sim outside [-1, 1]")
    }
  }

  test("restricted probe scores agree with the flat ADC and respect probed lists") {
    val k = 5
    val restricted = Similarity.ivfPqSearch(corpus, queryPred, k = k,
      nlist = 6, nprobe = 2, m = 4, nCent = 8)
    // flat cosine-ADC over ALL candidates (k covers every pair)
    val flatAll = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 1000,
      nlist = 1, nprobe = 1, m = 4, nCent = 8))
      .map(t => (t._1, t._2) -> t._3).toMap
    val got = rows(restricted)
    assert(got.nonEmpty)
    got.foreach { case (q, n, sim, _) =>
      assert(flatAll((q, n)) == sim,
        s"adc_sim for ($q,$n) diverged from the flat ranking")
    }
    // every neighbor's list must be among the query's nprobe=2 lists
    val cents = Similarity.ivfCentroids(corpus, 6)
    val q = corpus.filter(queryPred)
    val probed = Similarity.ivfProbe(
        Similarity.ivfAssign(corpus, cents), cents, q, k = 1000, nprobe = 2)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (qid, n, _, _) =>
      assert(probed.contains((qid, n)),
        s"neighbor $n of query $qid is outside the probed lists")
    }
  }

  test("determinism: two runs bit-identical") {
    val a = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8))
    val b = rows(Similarity.ivfPqSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8))
    assert(a == b && a.nonEmpty)
  }

  // ---- trained codebook (pqKmeansCodebook) ----

  private val dimC = 16
  private def clustered = ScaleSweep.embClustered(spark, 400, centers = 50, dim = dimC)

  /** Total encode distortion: Σ over (vector, subspace) of the integer
    * L2 to the NEAREST codeword — the product-quantizer objective,
    * computed independently of the encode kernel.
    */
  private def distortion(c: org.apache.spark.sql.DataFrame,
                         cb: org.apache.spark.sql.DataFrame, m: Int): Long = {
    val quant = expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
    val sub = s"(size(qe) div $m)"
    val vrows = c.select(col("vec_id").as("vid"), quant.as("qe"))
      .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
      .select(col("vid"), col("s"),
        expr(s"slice(qe, s * $sub + 1, $sub)").as("sv"))
    val cbRows = cb.withColumn("s", explode(sequence(lit(0), lit(m - 1))))
      .select(col("cid"), col("s"),
        expr(s"slice(qc, s * (size(qc) div $m) + 1, size(qc) div $m)").as("cv"))
    vrows.join(broadcast(cbRows), Seq("s"))
      .select(col("vid"), col("s"),
        expr("""aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),
                CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("d"))
      .groupBy(col("vid"), col("s")).agg(min(col("d")).as("md"))
      .agg(sum(col("md"))).collect()(0).getLong(0)
  }

  test("trained codebook: nCent full-dim rows, deterministic") {
    val cb = Similarity.pqKmeansCodebook(clustered, m = 4, nCent = 8,
      sampleMod = 1).collect()
    assert(cb.length == 8)
    assert(cb.map(_.getLong(1)).sorted.toSeq == (0L until 8L))
    cb.foreach(r => assert(r.getSeq[Long](0).length == dimC))
    val cb2 = Similarity.pqKmeansCodebook(clustered, m = 4, nCent = 8,
      sampleMod = 1).collect()
    assert(cb.map(_.toString).sorted.toSeq == cb2.map(_.toString).sorted.toSeq)
  }

  test("Lloyd monotonicity: trained codebook distortion <= rank-select's") {
    val quant = expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
    val rankCb = clustered.orderBy(col("vec_id")).limit(8)
      .select(quant.as("qc"),
        (org.apache.spark.sql.functions.row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
          .cast("long").as("cid"))
    val trainedCb = Similarity.pqKmeansCodebook(clustered, m = 4, nCent = 8,
      sampleMod = 1)
    val dRank = distortion(clustered, rankCb, 4)
    val dTrained = distortion(clustered, trainedCb, 4)
    assert(dTrained <= dRank,
      s"trained distortion $dTrained exceeds rank-select's $dRank")
    // on a clustered corpus the gap should be material, not epsilon
    assert(dTrained < dRank)
  }

  // ---- residual IVFADC ----

  test("residual: restricted probe scores agree with the all-lists probe") {
    val flatAll = rows(Similarity.ivfPqResidualSearch(corpus, queryPred,
      k = 1000, nlist = 6, nprobe = 6, m = 4, nCent = 8))
      .map(t => (t._1, t._2) -> t._3).toMap
    val got = rows(Similarity.ivfPqResidualSearch(corpus, queryPred,
      k = 5, nlist = 6, nprobe = 2, m = 4, nCent = 8))
    assert(got.nonEmpty)
    got.foreach { case (q, n, sim, _) =>
      assert(math.abs(sim) <= 1.0, s"adc_sim $sim outside [-1, 1]")
      assert(flatAll((q, n)) == sim,
        s"residual adc_sim for ($q,$n) diverged from the all-lists probe")
    }
  }

  test("residual: determinism (rank and trained codebooks)") {
    def run(trained: Boolean) = rows(Similarity.ivfPqResidualSearch(
      clustered, col("vec_id") % 40 === 0, k = 5, nlist = 8, nprobe = 2,
      m = 4, nCent = 8, trained = trained, sampleMod = 7))
    assert(run(trained = false) == run(trained = false))
    val t1 = run(trained = true)
    assert(t1 == run(trained = true) && t1.nonEmpty)
  }

  test("residual encoding beats the shared codebook on clustered data") {
    // the controlled r14 study at spec scale: coarse lists resolve the
    // cluster structure (nlist = centers), trained codebooks both
    // sides; ground truth = exact cosine top-5 on held-out queries
    val n = 4000L
    val centers = 16L
    val c = ScaleSweep.embClustered(spark, n, centers, dim = dimC)
    val qs = ScaleSweep.embClustered(spark, 16, centers, dim = dimC,
      idOffset = 1000000007L)
    val k = 5
    def topIds(df: org.apache.spark.sql.DataFrame, cand: String) =
      df.select(col("query_id").cast("long"), col(cand).cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topIds(Similarity.bruteForceTopKHeap(c, qs, k), "cand_id")
    def recallOf(a: Map[Long, Set[Long]]): Double = {
      val hit = exact.map { case (q, e) => (a.getOrElse(q, Set.empty) & e).size }.sum
      hit.toDouble / exact.values.map(_.size).sum
    }
    val cents = Similarity.ivfCentroids(c, 16).persist()
    cents.count()
    val sharedCb = Similarity.pqKmeansCodebook(c, m = 8, nCent = 64, sampleMod = 7)
    val (sIdx, sCb) = Similarity.ivfPqBuild(c, cents, m = 8, nCent = 64,
      codebook = Some(sharedCb))
    val shared = recallOf(topIds(
      Similarity.ivfPqProbe(sIdx, cents, sCb, qs, k, nprobe = 2, m = 8),
      "neighbor_id"))
    val (rIdx, rCb, rQc) = Similarity.ivfPqResidualBuild(c, cents,
      m = 8, nCent = 64, trained = true, sampleMod = 7)
    val res = recallOf(topIds(
      Similarity.ivfPqResidualProbe(rIdx, cents, rQc, rCb, qs, k,
        nprobe = 2, m = 8), "neighbor_id"))
    cents.unpersist()
    info(s"shared-codebook recall=$shared residual recall=$res")
    // measured at this fixture: shared 0.35, residual 0.70 — pin the
    // gap, not just the sign (deterministic fixture, stable values)
    assert(res >= shared + 0.2,
      s"residual recall $res not materially above shared-codebook $shared")
  }

  // ---- per-list ("local") codebooks ----

  test("local: restricted probe scores agree with the all-lists probe") {
    val flatAll = rows(Similarity.ivfPqLocalSearch(corpus, queryPred,
      k = 1000, nlist = 6, nprobe = 6, m = 4, nCent = 8))
      .map(t => (t._1, t._2) -> t._3).toMap
    val got = rows(Similarity.ivfPqLocalSearch(corpus, queryPred,
      k = 5, nlist = 6, nprobe = 2, m = 4, nCent = 8))
    assert(got.nonEmpty)
    got.foreach { case (q, n, sim, _) =>
      assert(math.abs(sim) <= 1.0, s"adc_sim $sim outside [-1, 1]")
      assert(flatAll((q, n)) == sim,
        s"local adc_sim for ($q,$n) diverged from the all-lists probe")
    }
  }

  test("local: determinism (rank + trained/hash-sampled codebooks)") {
    def run(trained: Boolean) = rows(Similarity.ivfPqLocalSearch(
      clustered, col("vec_id") % 40 === 0, k = 5, nlist = 8, nprobe = 2,
      m = 4, nCent = 8, trained = trained, sampleMod = 4))
    assert(run(trained = false) == run(trained = false))
    val t1 = run(trained = true)
    assert(t1 == run(trained = true) && t1.nonEmpty)
    def runHash() = rows(Similarity.ivfPqLocalSearch(
      clustered, col("vec_id") % 40 === 0, k = 5, nlist = 8, nprobe = 2,
      m = 4, nCent = 8, trained = true, sampleMod = 4, hashSample = true))
    assert(runHash() == runHash())
  }

  test("local codebooks beat the shared residual codebook on clustered data") {
    // the r14 capacity study at spec scale: more clusters than
    // codewords-per-mode can cover globally, lists resolving ~2
    // clusters each; trained codebooks both sides, hash-sampled
    val n = 6000L
    val centers = 48L
    val c = ScaleSweep.embClustered(spark, n, centers, dim = dimC)
    val qs = ScaleSweep.embClustered(spark, 16, centers, dim = dimC,
      idOffset = 1000000007L)
    val k = 5
    def topIds(df: org.apache.spark.sql.DataFrame, cand: String) =
      df.select(col("query_id").cast("long"), col(cand).cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topIds(Similarity.bruteForceTopKHeap(c, qs, k), "cand_id")
    def recallOf(a: Map[Long, Set[Long]]): Double = {
      val hit = exact.map { case (q, e) => (a.getOrElse(q, Set.empty) & e).size }.sum
      hit.toDouble / exact.values.map(_.size).sum
    }
    val cents = Similarity.ivfCentroids(c, 24).persist()
    cents.count()
    val (rIdx, rCb, rQc) = Similarity.ivfPqResidualBuild(c, cents,
      m = 4, nCent = 16, trained = true, sampleMod = 3, hashSample = true)
    val res = recallOf(topIds(
      Similarity.ivfPqResidualProbe(rIdx, cents, rQc, rCb, qs, k,
        nprobe = 2, m = 4), "neighbor_id"))
    val (lIdx, lCb, lQc) = Similarity.ivfPqLocalBuild(c, cents,
      m = 4, nCent = 16, trained = true, sampleMod = 3, hashSample = true)
    val loc = recallOf(topIds(
      Similarity.ivfPqLocalProbe(lIdx, cents, lQc, lCb, qs, k,
        nprobe = 2, m = 4), "neighbor_id"))
    cents.unpersist()
    info(s"shared-residual recall=$res local-codebook recall=$loc")
    // measured at this fixture: shared-residual 0.0375, local 0.3125 —
    // pin the gap (deterministic fixture, stable values)
    assert(loc >= res + 0.2,
      s"local-codebook recall $loc not materially above shared-residual $res")
  }

  test("local trained: lists with an EMPTY training sample keep every vector reachable") {
    // sampleMod 121 over ids 0..119 samples ONLY id 0 — every list but
    // id-0's trains on nothing. Pre-fix, those lists got no codebook
    // rows and the encode inner join silently dropped ALL their
    // vectors (r14 ADVICE, medium): unreachable at probe time. The
    // fallback gives each sample-empty list one rank-select codeword.
    val cents = Similarity.ivfCentroids(corpus, 6)
    val (index, rcb, _) = Similarity.ivfPqLocalBuild(corpus, cents,
      m = 4, nCent = 8, trained = true, sampleMod = 121)
    val indexed = index.select("cand_id").distinct().count()
    assert(indexed == 120L,
      s"trained local index lost ${120L - indexed} vectors to sample-empty lists")
    // every nonempty list owns codebook rows, and sample-empty lists
    // got exactly the single fallback codeword (cid 0)
    val cbLists = rcb.select("centroid_id").distinct().count()
    val lists = index.select("centroid_id").distinct().count()
    assert(cbLists == lists)
    // probes over fallback lists still answer
    val got = rows(Similarity.ivfPqLocalSearch(corpus, queryPred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8, trained = true,
      sampleMod = 121))
    assert(got.nonEmpty)
    got.foreach { case (_, _, sim, _) =>
      assert(math.abs(sim) <= 1.0, s"adc_sim $sim outside [-1, 1]")
    }
  }

  test("residual trained: an entirely EMPTY sample falls back to rank-select") {
    // ids 1..120 hold no multiple of 127 — the trained path's sample is
    // empty, the Lloyd codebook has zero rows, and pre-fix the encode
    // dropped the WHOLE corpus. The fallback makes it degrade to the
    // rank-select codebook exactly.
    val shifted = ScaleSweep.embCorpus(spark, 120, dim, idOffset = 1L)
    val pred = col("vec_id") % 20 === 0
    val trained = rows(Similarity.ivfPqResidualSearch(shifted, pred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8, trained = true,
      sampleMod = 127))
    val rank = rows(Similarity.ivfPqResidualSearch(shifted, pred, k = 5,
      nlist = 6, nprobe = 2, m = 4, nCent = 8, trained = false))
    assert(trained == rank && rank.nonEmpty)
  }

  test("ivfPqBuild: an EMPTY supplied codebook falls back to the default") {
    val cents = Similarity.ivfCentroids(corpus, 6)
    val emptyCb = Similarity.pqKmeansCodebook(corpus, m = 4, nCent = 8,
      sampleMod = 1).filter(lit(false))
    val (gotIdx, _) = Similarity.ivfPqBuild(corpus, cents, m = 4, nCent = 8,
      codebook = Some(emptyCb))
    val (wantIdx, _) = Similarity.ivfPqBuild(corpus, cents, m = 4, nCent = 8)
    val g = gotIdx.collect().map(_.toSeq).toSet
    val w = wantIdx.collect().map(_.toSeq).toSet
    assert(g == w && w.nonEmpty)
  }

  test("residual probe: broadcastLuts=false (shuffle-join escape hatch) is value-identical") {
    val cents = Similarity.ivfCentroids(corpus, 6)
    val (index, rcb, qcents) = Similarity.ivfPqResidualBuild(corpus, cents,
      m = 4, nCent = 8)
    val q = corpus.filter(queryPred)
    val hinted = rows(Similarity.ivfPqResidualProbe(index, cents, qcents,
      rcb, q, k = 5, nprobe = 2, m = 4))
    val shuffled = rows(Similarity.ivfPqResidualProbe(index, cents, qcents,
      rcb, q, k = 5, nprobe = 2, m = 4, broadcastLuts = false))
    assert(hinted == shuffled && hinted.nonEmpty)
  }

  test("PACKED probes are bit-identical to the long-form probes (shared + residual)") {
    val cents = Similarity.ivfCentroids(corpus, 6)
    val q = corpus.filter(queryPred)
    // shared codebook
    val (longIdx, cb) = Similarity.ivfPqBuild(corpus, cents, m = 4, nCent = 8)
    val (packedIdx, cbP) = Similarity.ivfPqBuildPacked(corpus, cents,
      m = 4, nCent = 8)
    val longRows = rows(Similarity.ivfPqProbe(longIdx, cents, cb, q,
      k = 5, nprobe = 2, m = 4))
    val packedRows = rows(Similarity.ivfPqProbePacked(packedIdx, cents, cbP,
      q, k = 5, nprobe = 2, m = 4))
    assert(longRows == packedRows && longRows.nonEmpty)
    // residual (IVFADC) — rank-select and trained codebooks
    for (trained <- Seq(false, true)) {
      val (li, rcb, qc) = Similarity.ivfPqResidualBuild(corpus, cents,
        m = 4, nCent = 8, trained = trained, sampleMod = 4)
      val (pi, rcbP, qcP) = Similarity.ivfPqResidualBuildPacked(corpus,
        cents, m = 4, nCent = 8, trained = trained, sampleMod = 4)
      val lr = rows(Similarity.ivfPqResidualProbe(li, cents, qc, rcb, q,
        k = 5, nprobe = 2, m = 4))
      val pr = rows(Similarity.ivfPqResidualProbePacked(pi, cents, qcP,
        rcbP, q, k = 5, nprobe = 2, m = 4))
      assert(lr == pr && lr.nonEmpty, s"trained=$trained diverged")
    }
    // packed + un-hinted LUTs (shuffle-join escape hatch)
    val shuffled = rows(Similarity.ivfPqProbePacked(packedIdx, cents, cbP,
      q, k = 5, nprobe = 2, m = 4, broadcastLuts = false))
    assert(shuffled == packedRows)
  }

  test("packCodes inverts the packed/long layouts") {
    val cents = Similarity.ivfCentroids(corpus, 6)
    val (longIdx, _) = Similarity.ivfPqBuild(corpus, cents, m = 4, nCent = 8)
    val (packedIdx, _) = Similarity.ivfPqBuildPacked(corpus, cents,
      m = 4, nCent = 8)
    val repacked = Similarity.packCodes(longIdx)
      .collect().map(_.toSeq).toSet
    assert(repacked == packedIdx.collect().map(_.toSeq).toSet &&
      repacked.nonEmpty)
  }

  test("probe over a trained codebook keeps the cosine contract") {
    val cents = Similarity.ivfCentroids(clustered, 4)
    val cb = Similarity.pqKmeansCodebook(clustered, m = 4, nCent = 8,
      sampleMod = 1)
    val (index, cbOut) = Similarity.ivfPqBuild(clustered, cents,
      m = 4, nCent = 8, codebook = Some(cb))
    val got = rows(Similarity.ivfPqProbe(index, cents, cbOut,
      clustered.filter(col("vec_id") % 40 === 0), k = 5, nprobe = 2, m = 4))
    assert(got.nonEmpty)
    got.foreach { case (_, _, sim, _) =>
      assert(math.abs(sim) <= 1.0, s"adc_sim $sim outside [-1, 1]")
    }
  }
}
