package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and scale"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("E1: exact dedup collapses identical content, keeps min id") {
    val out = Dedup.exactByContent(docs, "text", "doc_id")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) == 2L) // docs 1+4 collapse, keep_id=1
    assert(out(2L) == 1L && out(3L) == 1L)
  }

  test("E2: word shingles are distinct n-grams; short docs drop out") {
    val d = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(d, "text", "doc_id", 3)
    val got = sh.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"))) // doc 2: too short
  }

  test("E2: minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated stays out
  }

  test("E2: simhash — identical docs equal; near-dups closer than unrelated") {
    val hashes = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) < ham(hashes(1L), hashes(3L)))
  }

  test("E2: char shingles catch within-word edits that word shingles miss") {
    val d = Seq((1L, "abcdefghij"), (2L, "abcdefghiX"), (3L, "zzzzzzzzzz"))
      .toDF("doc_id", "text")
    val sh = Dedup.charShingles(d, "text", "doc_id", 5)
    // doc1/doc2 share 5 of their 6 5-grams (differ only at the tail)
    val shared = sh.filter(col("doc_id") === 1).select("shingle")
      .intersect(sh.filter(col("doc_id") === 2).select("shingle")).count()
    assert(shared == 5)
  }

  test("E2: simhash near-dup pairs — exact dup at hamming 0, unrelated absent") {
    val pairs = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 4L)) == 0L) // exact dup: identical signature
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hammingDistance column matches bitCount") {
    val d = Seq((5L, 3L)).toDF("a", "b")
    assert(d.select(Dedup.hammingDistance(col("a"), col("b"))).head().getInt(0) == 2)
  }

  test("empty/short documents flow through the near-dup pipeline unharmed") {
    // docs below the shingle size produce no shingles → no profile → no
    // pairs; they must neither crash any stage nor be dropped
    val docs = Seq(
      (1L, ""), (2L, "ab"), (3L, "one two"),
      (10L, "a long document with enough words to shingle properly here"),
      (11L, "a long document with enough words to shingle properly too"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
    val pairSet = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairSet == Set((10L, 11L)))
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 10L)) // only the pair's right side dropped
  }

  test("connectedComponents merges chains pairwise drop would miss") {
    // two chains: 1-2-3-4 (path — 1~4 never a direct pair) and 10-11;
    // plus an isolated pair edge list entry 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges within the diameter bound") {
    // a 12-node path: diameter 11 — label propagation needs ~log-ish
    // rounds for min to travel; maxIter must cover it
    val path = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(path, "doc_id", maxIter = 20)
      .select("component").distinct().collect().map(_.getLong(0)).toSeq
    assert(comps == Seq(0L))
  }

  test("star CC: identical components to label propagation on mixed shapes") {
    // path + pair + triangle-with-tail + isolated pair: covers chains,
    // cycles, and already-star shapes in one edge list
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L),
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L))
      .toDF("id_a", "id_b")
    val lp = Dedup.connectedComponents(pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == lp)
    assert(star(4L) == 1L && star(33L) == 30L)
  }

  test("star CC: 100-link chain converges in O(log d) rounds, same labels") {
    // the adversarial shape for label propagation: diameter 100 means
    // 100 propagation rounds (the default maxIter=20 would cap out);
    // star contraction must close it in a handful of alternations
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsStarWithRounds(chain, "doc_id")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 100L).map(_ -> 0L).toMap)
    assert(rounds <= 8, s"star contraction took $rounds rounds on a 100-chain")
    // ground truth from label propagation given enough rounds
    val lp = Dedup.connectedComponents(chain, "doc_id", maxIter = 150)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lp)
  }

  test("contaminationReport finds planted benchmark overlap, ignores clean docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),     // shares a 5-gram with bench 10
      (2L, "one two three four five six seven"),       // clean
      (3L, "alpha beta gamma delta epsilon different")) // shares the same 5-gram
      .toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon prefix"),
      (11L, "unrelated benchmark content entirely here")).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(train, bench, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // only the shared "alpha beta gamma delta epsilon" gram collides
    assert(got == Map(1L -> ((1L, 1L)), 3L -> ((1L, 1L))))
  }

  test("hot-bucket cap bounds LSH candidates on a pathological corpus") {
    // 200 copies of the same boilerplate: every band signature collides,
    // so uncapped LSH goes quadratic (200*199/2 pairs) — the cap drops
    // the oversized buckets wholesale (exact dedup's job, not LSH's)
    val boiler = (0L until 200L)
      .map(i => (i, "the same boilerplate page body repeated on every site"))
      .toDF("doc_id", "text")
    val profiles = Dedup.dedupProfiles(
      Dedup.rawWordShingles(boiler, "text", "doc_id", 3), "doc_id", 8, 2)
    val uncapped = Dedup.profileCandidatePairs(profiles, "doc_id").count()
    val capped = Dedup.profileCandidatePairs(profiles, "doc_id",
      maxBucketSize = Some(10)).count()
    assert(uncapped == 200L * 199L / 2)
    assert(capped == 0L)
    // the recall audit: oversizedBuckets reports exactly what the cap
    // dropped — all 8 bands collide into one 200-doc bucket each
    val dropped = Dedup.oversizedBuckets(
      profiles.select(col("doc_id"), explode(col("band_sigs")).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig")), 10)
      .collect()
    assert(dropped.length == 8 && dropped.forall(_.getLong(2) == 200L))
    // a mixed corpus: near-dup pairs in small buckets survive the cap
    val mixed = boiler.unionByName(Seq(
      (1000L, "a genuinely unique document about distributed query engines"),
      (1001L, "a genuinely unique document about distributed query planners"))
      .toDF("doc_id", "text"))
    val mixedProfiles = Dedup.dedupProfiles(
      Dedup.rawWordShingles(mixed, "text", "doc_id", 3), "doc_id", 8, 2)
    val mixedCapped = Dedup.profileCandidatePairs(mixedProfiles, "doc_id",
      maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mixedCapped.toSeq == Seq((1000L, 1001L)))
  }

  test("clusterRepresentatives keeps one survivor per component " +
    "(vs pairwise drop on transitive shapes)") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    // pairs (1,3), (2,3): pairwise drop removes only 3 (2 never an
    // id_b), but {1,2,3} is ONE component -> only 1 survives
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val pairwise = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .as[Long].collect().sorted
    val cluster = Dedup.clusterRepresentatives(docs, pairs, "doc_id")
      .as[Long].collect().sorted
    assert(pairwise.toSeq == Seq(1L, 2L, 9L))
    assert(cluster.toSeq == Seq(1L, 9L))
  }

  test("containmentFromProfiles: a quoted subset scores ~1 on its side, low Jaccard") {
    import spark.implicits._
    // doc 1 (8 tokens) appears verbatim inside doc 2 (24 tokens):
    // every 3-gram of doc 1 is in doc 2
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = s"intro words here $short plus a very long unrelated tail of filler content"
    val d = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val profiles = Dedup.dedupProfiles(
      Dedup.rawWordShingles(d, "text", "doc_id", 3), "doc_id", 8, 2)
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val c = Dedup.containmentFromProfiles(profiles, cands, "doc_id").head()
    val j = Dedup.jaccardFromProfiles(profiles, cands, "doc_id").head()
    assert(c.getDouble(3) == 1.0, "short side fully contained")
    assert(c.getDouble(4) < 0.5, "long side mostly its own")
    assert(j.getDouble(2) < 0.5, "Jaccard misses the quote")
  }

  test("bloomScreenStats: exact dup is always a candidate; counts reconcile") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumps over the lazy dog"),
      (3L, "entirely different content here")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "The  quick brown FOX"), // normalizes to doc 1 → true dup
      (102L, "completely novel text"),
      (103L, "another new document")).toDF("doc_id", "text")
    val r = Dedup.bloomScreenStats(corpus, batch, "text", "doc_id", 4096).head()
    assert(r.getAs[Long]("n_batch") == 3L)
    assert(r.getAs[Long]("n_true_dup") == 1L)
    assert(r.getAs[Long]("n_missed") == 0L, "Bloom filters have no false negatives")
    assert(r.getAs[Long]("n_candidates") + r.getAs[Long]("n_definitely_new") == 3L)
    assert(r.getAs[Long]("n_candidates") ==
      r.getAs[Long]("n_true_dup") + r.getAs[Long]("n_false_pos"))
  }

  test("softDedupWeights: weight = 1e6 / cluster size; singletons keep full weight") {
    val out = Dedup.softDedupWeights(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "one weight row per document")
    // doc 3 is unrelated → singleton at full weight
    assert(out(3L) == ((1L, 1000000L)))
    // docs 1 and 4 are exact dups → same cluster, size ≥ 2, and the
    // weight is exactly the integer inverse of that size
    assert(out(1L) == out(4L))
    assert(out(1L)._1 >= 2L)
    out.values.foreach { case (sz, w) => assert(w == 1000000L / sz) }
  }

  test("dupNgramCoverage: shared 5-grams counted, unique docs at zero, short docs absent") {
    val d = Seq(
      (1L, "a b c d e f"),             // 5-grams: "a b c d e", "b c d e f"
      (2L, "a b c d e x"),             // shares "a b c d e" with doc 1
      (3L, "p q r s t u v"),           // 3 grams, none shared
      (4L, "too short")                // < 5 tokens → no row
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(d, "text", "doc_id", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 500L),
      (2L, 2L, 1L, 500L),
      (3L, 3L, 0L, 0L)))
  }

  test("dupNgramCoverage: within-doc repeats count once (distinct per doc)") {
    // doc 1 contains the same 5-gram twice; doc 2 has it once — the
    // doc-frequency must be 2 (not 3), and doc 1's coverage is over its
    // DISTINCT gram set.
    val d = Seq(
      (1L, "a b c d e z a b c d e"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(d, "text", "doc_id", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 grams: 7 positions → distinct set {abcde, bcdez, cdeza,
    // dezab, ezabc, zabcd, abcde(dup)} = 6 distinct, 1 shared
    assert(out.toSeq == Seq((1L, 6L, 1L), (2L, 1L, 1L)))
  }

  test("minhashErrorAudit: identical docs have zero error; invariants hold") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // = doc 1 → all 16 slots agree
      (3L, "alpha beta gamma zeta epsilon"),
      (4L, "unrelated words entirely different here")).toDF("doc_id", "text")
    val rows = Dedup.minhashErrorAudit(d, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // identical pair must be a candidate (every band collides): est 16,
    // inter = union, err = 16·U − 16·I = 0
    val (est, i12, u12, err) = rows((1L, 2L))
    assert(est == 16L && i12 == u12 && err == 0L)
    // global invariants: slots ≤ 16, inter ≤ union, err formula exact
    rows.values.foreach { case (e, i, u, er) =>
      assert(e >= 0L && e <= 16L && i <= u && er == e * u - 16L * i)
    }
  }

  test("sourceOverlapMatrix: identical sources at 10000 bp, partial exact, disjoint absent") {
    import spark.implicits._
    // s1 ≡ s2 (same shingle set), s3 shares "b c d" with both via one
    // doc, s4 disjoint. 3-gram sets: s1/s2 = {a b c, b c d}; s3 =
    // {b c d, c d e}; s4 = {x y z}.
    val d = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"),
      (3L, "b c d e", "s3"), (4L, "x y z", "s4"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.sourceOverlapMatrix(d, "text", "doc_id", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows((String.valueOf("s1"), "s2")) === ((2L, 2L, 2L, 2L, 10000L)))
    assert(rows(("s1", "s3")) === ((2L, 2L, 1L, 3L, 3333L)))
    assert(rows(("s2", "s3")) === ((2L, 2L, 1L, 3L, 3333L)))
    assert(rows.size === 3, "disjoint s4 must emit no pair rows")
  }

  test("chainAudit: a chain cluster is flagged, a tight cluster is not") {
    // docs 1/2 and 2/3 are near-dups but 1/3 share almost nothing —
    // transitive closure chains them into one cluster whose weakest
    // pair (1,3) has low exact Jaccard → chained. Docs 10/11 are
    // near-identical → tight cluster, chained = false.
    val mid = (1 to 12).map(i => s"mid$i").mkString(" ")
    val d = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $mid"),
      (2L, s"$mid z1 z2 z3 z4 z5 z6 z7 z8"),
      (3L, s"q1 q2 q3 $mid q9 q10 q11 q12 q13 q14 q15 q16"),
      (10L, "same same2 same3 same4 same5 same6 same7 same8 tail"),
      (11L, "same same2 same3 same4 same5 same6 same7 same8 other"))
      .toDF("doc_id", "text")
    val out = Dedup.chainAudit(d, "text", "doc_id", threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // tight cluster {10, 11}
    val tight = out(10L)
    assert(tight.getAs[Long]("n_members") == 2L)
    assert(tight.getAs[Long]("n_pairs") == 1L)
    assert(!tight.getAs[Boolean]("chained"))
    // the chain {1,2,3} forms deterministically at this banding
    // (verified edges J(1,2)=.385, J(2,3)=.345; (1,3) only via closure)
    val chain = out(1L)
    assert(chain.getAs[Long]("n_members") == 3L)
    assert(chain.getAs[Long]("n_pairs") == 3L, "all member pairs, not just edges")
    assert(chain.getAs[Long]("min_jbp") < 5000L)
    assert(chain.getAs[Boolean]("chained"))
  }

  test("ngramNovelty: first carrier scores novel, later carriers see its grams") {
    // doc 1: grams {"a b c", "b c d"}; doc 2 repeats gram "a b c" and
    // adds "c x y"-family grams; doc 3 is all-new.
    val d = Seq(
      (1L, "a b c d"),          // 2 grams, both first here → novelty 10000
      (2L, "a b c q r"),        // grams {a b c, b c q, c q r}: 1 seen → (3-1)·10000/3
      (3L, "u v w x y"))        // all new
      .toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(d, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 0L, 10000L)))
    assert(out(2L) == ((3L, 1L, 6666L)))
    assert(out(3L) == ((3L, 0L, 10000L)))
  }

  test("exactSubstringPairs: shared paragraph found at any alignment; matches are exact") {
    // a ~200-char shared span (25 distinct words) placed at DIFFERENT
    // offsets in two otherwise-disjoint docs; selection is content-only
    // so alignment cannot matter. ~160 windows in the span → the
    // 0-mod-8 thinning keeps some with overwhelming margin (content is
    // fixed, so the outcome is deterministic).
    val shared = (1 to 25).map(i => s"shared$i").mkString(" ")
    val fillA = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val fillB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val d = Seq(
      (1L, s"$fillA $shared endalpha"),
      (2L, s"$fillB $shared endbeta"),
      (3L, "gamma one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstringPairs(d, "text", "doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      "only the pair sharing the span may match")
    val r = out.head
    assert(r.getAs[Long]("n_shared") >= 1L)
    // exactness self-check: the k-char windows at the reported first
    // offsets must be IDENTICAL strings in both docs
    val texts = d.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val (fa, fb) = (r.getAs[Long]("first_a").toInt, r.getAs[Long]("first_b").toInt)
    assert(texts(1L).substring(fa - 1, fa - 1 + 40) ==
      texts(2L).substring(fb - 1, fb - 1 + 40))
  }

  test("exactSubstringPairs: hot-window cap drops boilerplate shared by > maxDf docs") {
    val body = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val many = (1L to 60L).map(i => (i, body)).toDF("doc_id", "text")
    assert(Dedup.exactSubstringPairs(many, "text", "doc_id", maxDf = 50).count() == 0,
      "every window lives in 60 > maxDf docs — all capped away")
    val uncapped = Dedup.exactSubstringPairs(many, "text", "doc_id", maxDf = 60)
    assert(uncapped.count() == 60L * 59 / 2, "uncapped: all pairs, once each")
  }

  test("exactSubstringPairs: sub-k overlap is invisible; within-doc repeats don't self-pair") {
    // shared run of 4 words ≈ 28 chars < k=40 → no pair
    val d = Seq(
      (1L, "prefix1 prefix2 common1 common2 common3 common4 tail1 tail2 tail3"),
      (2L, "other1 other2 common1 common2 common3 common4 end1 end2 end3"),
      (3L, ((1 to 40).map(_ => "loop word").mkString(" "))))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstringPairs(d, "text", "doc_id").collect()
    assert(!out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!out.exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("prefixJaccardJoin finds exact and near dups, drops dissimilar") {
    val out = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
        shingleSize = 5, tNum = 7, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1≈2 (one word differs), 1=4, 2≈4; 3 shares nothing above 0.7
    assert(out == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefixJaccardJoin is COMPLETE: matches brute-force all-pairs on sf0.001") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val pruned = Dedup.prefixJaccardJoin(d, "text", "doc_id",
        shingleSize = 12, tNum = 8, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: every co-occurring pair, no prefix pruning
    val sh = Dedup.charShingles(d, "text", "doc_id", 12)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .filter(col("n_inter") * 10 >= (col("n_a") + col("n_b") - col("n_inter")) * 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_inter"))).toSet
    assert(pruned == brute, "prefix filtering must lose no pair")
    assert(brute.nonEmpty, "fixture must actually contain near-dups")
  }

  test("prefixJaccardJoin hot-prefix cap: boilerplate pairs drop with accounting, clean pairs keep the guarantee") {
    // Constructed hot-prefix corpus: 6 identical boilerplate docs whose
    // EVERY shingle has df = 6 (even the rarest — the fully-capped
    // case), plus 2 near-dup docs over a disjoint alphabet (all
    // shingle df <= 2). shingleSize 5, threshold 0.7.
    val boiler = (10L to 15L).map(i => (i, "abcdeabcde"))
    val d = (boiler ++ Seq((1L, "vwxyzvwxy"), (2L, "vwxyzvwx")))
      .toDF("doc_id", "text")
    def pairs(maxDf: Long) =
      Dedup.prefixJaccardJoin(d, "text", "doc_id", 5, 7, 10, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Long.MaxValue)
    val capped = pairs(5L)
    // uncapped: all 15 boilerplate pairs + the (1,2) near-dup
    assert(uncapped.size == 16 && uncapped.contains((1L, 2L)))
    // capped at 5: boilerplate (df 6) vanishes; the clean pair survives
    assert(capped == Set((1L, 2L)))
    assert(capped.subsetOf(uncapped))

    val audit = Dedup.prefixJoinCapAudit(d, "text", "doc_id", 5, 7, 10, 5L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    (10L to 15L).foreach { i =>
      val (nPrefix, nCapped, full) = audit(i)
      assert(full && nCapped == nPrefix && nCapped > 0,
        s"boilerplate doc $i must be reported fully capped")
    }
    Seq(1L, 2L).foreach { i =>
      assert(audit(i)._2 == 0L, s"clean doc $i must report zero cap events")
    }
    // the zero-FN guarantee survives for pairs whose BOTH ends are clean
    val clean = audit.filter(_._2._2 == 0L).keySet
    val guaranteed = uncapped.filter(p => clean(p._1) && clean(p._2))
    assert(guaranteed.subsetOf(capped))
  }

  test("weightedJaccard separates proportions set-Jaccard cannot; cap drops stopword-only pairs") {
    val d = Seq(
      (1L, "alpha alpha alpha beta"),   // same SET as 2, different tf
      (2L, "alpha beta beta beta"),
      (3L, "alpha alpha alpha beta"),   // exact dup of 1
      (4L, "gamma delta epsilon zeta")  // unrelated
    ).toDF("doc_id", "text")
    // loose threshold surfaces the skewed pair with its true jw
    val loose = Dedup.weightedJaccardPairs(d, "text", "doc_id", 100L, 1, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(loose((1L, 3L)) == 1000L, "exact dup scores 1000 permille")
    // {alpha³β} vs {αβ³}: smin = 2, tots 4+4 → jw = 2/6 = 333‰ —
    // the SET Jaccard of this pair is 1.0; weighted sees the skew
    assert(loose((1L, 2L)) == 333L)
    assert(!loose.contains((1L, 4L)))
    // at 0.5 the proportion-skewed pair is correctly rejected
    val tight = Dedup.weightedJaccardPairs(d, "text", "doc_id", 100L, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 3L)))
    // cap: pairs sharing ONLY a hot token (df > maxDf) are not found
    val hot = Seq((1L, "the unique1"), (2L, "the unique2"), (3L, "the unique3"))
      .toDF("doc_id", "text")
    assert(Dedup.weightedJaccardPairs(hot, "text", "doc_id", 2L, 1, 10)
      .count() == 0L)
  }

  test("incrementalComponents: cross-batch chain merge ≡ from-scratch closure") {
    // old batch closes {1,2} and {10,11}; new batch bridges 2-3 (grows
    // an old component), adds {20,21} (brand new), leaves {10,11} alone
    val oldPairs = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val newPairs = Seq((2L, 3L), (20L, 21L)).toDF("id_a", "id_b")
    val oldLabels = Dedup.connectedComponents(oldPairs, "doc_id")
    val inc = Dedup.incrementalComponents(oldLabels, newPairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(
        oldPairs.unionByName(newPairs), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc(3L) == 1L, "new pair must chain through the OLD label to 1")
    assert(inc(11L) == 10L && inc(20L) == 20L && inc(21L) == 20L)
  }

  test("prefixJaccardJoin boundary: J exactly at threshold is kept") {
    // sets of 5-gram shingles engineered so J = 4/5 = 0.8 exactly:
    // a 9-char string has 5 5-grams; dropping the last char leaves 4
    // shared of 5 → J = 4/(5+4-4) = 4/5
    val d = Seq((1L, "abcdefghi"), (2L, "abcdefgh")).toDF("doc_id", "text")
    val keep = Dedup.prefixJaccardJoin(d, "text", "doc_id", 5, 8, 10).count()
    assert(keep == 1L)
    val drop = Dedup.prefixJaccardJoin(d, "text", "doc_id", 5, 81, 100).count()
    assert(drop == 0L)
  }
}
