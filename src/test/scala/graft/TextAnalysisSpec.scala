package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textStats on a known string") {
    val d = Seq((1L, "Hello, world! Hello again.")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(d, "text", "doc_id").head()
    assert(r.getAs[Int]("n_chars") == 26)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_distinct_tokens") == 4) // "hello," ≠ "hello" — all 4 distinct
    assert(r.getAs[Int]("n_punct") == 3) // , ! .
  }

  test("languageId: marker-dominant language wins; no markers → und") {
    val d = Seq(
      (1L, "the cat and the dog is a friend of mine"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("fingerprint: invariant to case and whitespace runs") {
    val d = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("qualityScore tiers are ordered by the CASE chain") {
    val d = Seq(
      (1L, "unique distinct varied words compose sentences"), // high ttr, long tokens
      (2L, "a a a a a a a a b b")).toDF("doc_id", "text")     // low ttr
    val out = TextAnalysis.qualityScore(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("quality")).toMap
    assert(out(1L) == "high")
    assert(out(2L) == "low")
  }

  test("tfIdfTopK: rare terms outrank common ones; rational idf is exact") {
    // 'rare' appears in 1 of 3 docs, 'shared' in all 3: for doc 1,
    // score(rare) = (1·3)/1 = 3.0 > score(shared) = (1·3)/3 = 1.0
    val d = Seq(
      (1L, "shared rare"), (2L, "shared common common"), (3L, "shared common"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tfIdfTopK(d, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getLong(5)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._4)
    assert(doc1.map(_._2).toSeq == Seq("rare", "shared"))
    assert(doc1.head._3 == 3.0 && doc1(1)._3 == 1.0)
    // doc 2: tf(common)=2 → (2·3)/2 = 3.0 beats shared at 1.0
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._4)
    assert(doc2.head._2 == "common" && doc2.head._3 == 3.0)
  }

  test("redactPii scrubs emails before digit runs and counts both") {
    val d = Seq(
      (1L, "mail bob.smith+x@corp.example.org card 12345678 ok"),
      (2L, "no pii here"),
      (3L, "a@b.io and 9999 twice 12345")).toDF("id", "text")
    val out = TextAnalysis.redactPii(d, "text", "id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((1L, 1L, "mail <EMAIL> card <NUM> ok")))
    assert(out(2L) == ((0L, 0L, "no pii here")))
    assert(out(3L) == ((1L, 2L, "<EMAIL> and <NUM> twice <NUM>")))
  }

  test("repetitionProfile: dominant token with lexicographic tie-break") {
    val d = Seq(
      (1L, "spam spam spam eggs"),          // clear winner
      (2L, "beta alpha beta alpha gamma"))  // tie at 2 → 'alpha' (lex first)
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(d, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out(1L) == ((4L, 2L, "spam", 3L, 0.75)))
    assert(out(2L) == ((5L, 3L, "alpha", 2L, 0.4)))
  }

  test("topBigrams counts adjacent pairs with a deterministic tie-break") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat sat"),        // "the cat", "cat sat"
      (2L, "the cat ran"),        // "the cat", "cat ran"
      (3L, "single"),             // no bigram
      (4L, ""))                   // no bigram
      .toDF("doc_id", "text")
    val out = TextAnalysis.topBigrams(d, "text", "doc_id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "the cat" ×2 first; then the count-1 ties resolve lexicographically
    assert(out.toSeq == Seq(("the cat", 2L), ("cat ran", 1L)))
  }

  test("bigramSurprisal matches a driver-side reference LM (exact integer bits)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "a rare zebra xylophone"),
      (4L, "the the the the"),
      (5L, "single"))
    // reference: tokenize, unigram/bigram counts, V, then per-bigram
    // floor(log2((c1+V)/(c12+1))) via exact BigInt bit-length compare
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = uni.size.toLong
    val bigs = toks.flatMap { case (id, ts) => ts.sliding(2).collect { case Seq(a, b) => (id, a, b) } }
    val c12 = bigs.groupBy { case (_, a, b) => (a, b) }.map { case (k, vs) => k -> vs.size.toLong }
    def fl2(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)
    def bits(num: Long, den: Long): Long = {
      val k0 = fl2(den) - fl2(num)
      if ((num << k0) <= den) k0 else k0 - 1
    }
    val expected = bigs.groupBy(_._1).map { case (id, bs) =>
      val total = bs.map { case (_, a, b) => bits(c12((a, b)) + 1, uni(a) + v) }.sum
      (id, bs.size.toLong, total, total * 1000 / bs.size)
    }.toSet
    val got = TextAnalysis.bigramSurprisal(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected) // doc 5 (no bigrams) absent from both
  }

  test("bm25TopK matches a driver-side BigInt reference (exact micro-units)") {
    val docs = Seq(
      (1L, "spark shuffle join join join"),
      (2L, "spark scan"),
      (3L, "join scan scan spark spark spark"),
      (4L, "nothing relevant here at all"),
      (5L, "join"))
    val terms = Seq("join", "scan")
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = BigInt(toks.size); val total = BigInt(toks.map(_._2.size).sum)
    val dfm = terms.map(t => t -> BigInt(toks.count(_._2.contains(t)))).toMap
    val expected = toks.flatMap { case (id, ts) =>
      val dl = BigInt(ts.size)
      val scores = terms.flatMap { t =>
        val tf = BigInt(ts.count(_ == t))
        if (tf == 0) None else {
          val idfN = 2 * (n - dfm(t)) + 1; val idfD = 2 * dfm(t) + 1
          val tfN = 44 * tf * total
          val tfD = 20 * total * tf + 6 * total + 18 * dl * n
          Some((idfN * tfN * 1000000) / (idfD * tfD))
        }
      }
      if (scores.isEmpty) None
      else Some((id, scores.size.toLong, scores.sum.toLong))
    }.sortBy { case (id, _, s) => (-s, id) }.take(3)
    val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"), "text", "doc_id", terms, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected) // doc 4 (no query terms) excluded
  }

  test("charDiversity: exact integer bits against a hand fold") {
    // "aab": L=3, counts a->2 b->1; fl2(3)=1, fl2(2)=1, fl2(1)=0
    // bits = 2*(1-1) + 1*(1-0) = 1; distinct = 2
    // "AAAA" lowers to "aaaa": L=4, one run of 4 -> 4*(2-2) = 0 bits
    // "" drops out after trim
    val out = TextAnalysis.charDiversity(
      Seq((1L, "aab"), (2L, "AAAA"), (3L, "  "), (4L, "abcd"))
        .toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 2L, 1L)),
      2L -> ((4L, 1L, 0L)),
      4L -> ((4L, 4L, 8L)))) // 4 chars * (fl2(4)=2 - fl2(1)=0) = 8
  }

  test("canonicalizeUrl: host case, www, utm params, fragment, trailing slash") {
    val cases = Seq(
      ("https://www.CDN0.Example.COM/a/b/?utm_source=x&utm_campaign=y#frag",
        "https://cdn0.example.com/a/b"),
      ("https://cdn1.example.com/a?ref=r1&utm_medium=m&id=2",
        "https://cdn1.example.com/a?ref=r1&id=2"),
      ("http://Host.com/", "https://host.com"),
      ("https://host.com/path", "https://host.com/path"),
      ("https://host.com", "https://host.com"))
    val out = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(out(i.toLong) == want, s"url $u")
    }
  }

  test("hashedLinearScore matches a hand-computed fold") {
    // weight of token t: h = fold(h·31 + cp) mod 1e9+7 over lowercased
    // t, then ((h mod 256)·2654435761) mod 2003 − 1001 — recomputed
    // here from first principles.
    def w(tok: String): Long = {
      val h = tok.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
      (h % 256) * 2654435761L % 2003L - 1001L
    }
    val d = Seq((1L, "The  quick brown FOX"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val want1 = Seq("the", "quick", "brown", "fox").map(w).sum
    assert(out(1L)._1 == 4L && out(1L)._2 == want1)
    assert(out(1L)._3 == (if (want1 >= 0) "keep" else "drop"))
    // empty / whitespace-only docs score the bias (0) and keep
    assert(out(2L) == ((0L, 0L, "keep")))
    assert(out(3L) == ((0L, 0L, "keep")))
  }

  test("hashedLinearScore decisions split the fixture corpus both ways") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val byDec = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .groupBy("decision").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDec.getOrElse("keep", 0L) > 0 && byDec.getOrElse("drop", 0L) > 0)
  }

  test("invertedIndex: known postings, positions, and block split") {
    val d = Seq(
      (0L, "a b a"),        // a at 0,2; b at 1
      (1L, "b  a"),         // run of spaces = ONE delimiter (regex \s+)
      (2L, "c"),
      (5L, "a")             // block 1 under blockWidth=4
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.invertedIndex(d, "text", "doc_id", blockWidth = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6))))
      .toMap
    // "a": block 0 has docs 0 (pos 0,2) and 1 (pos 1 — \s+ collapses
    // the double space, so no empty token takes a position);
    // block 1 has doc 5
    assert(rows(("a", 0L)) == ((2L, 3L, "0:0|2;1:1", 3L, 4L)))
    assert(rows(("a", 1L)) == ((1L, 1L, "5:0", 3L, 4L)))
    assert(rows(("b", 0L)) == ((2L, 2L, "0:1;1:0", 2L, 2L)))
    assert(rows(("c", 0L)) == ((1L, 1L, "2:0", 1L, 1L)))
  }

  test("invertedIndex blocks bound row size: block_df ≤ blockWidth") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val idx = TextAnalysis.invertedIndex(docs, "text", "doc_id", blockWidth = 8)
    assert(idx.filter(col("block_df") > 8).count() == 0)
    // df must equal the number of docs containing the token: spot-check
    // consistency — sum of block_df over a token equals its df column
    val bad = idx.groupBy(col("tok"), col("df"))
      .agg(sum(col("block_df")).as("s"))
      .filter(col("s") =!= col("df")).count()
    assert(bad == 0)
  }

  test("qualityEnsemble: degenerate repetition drops, diverse prose keeps, length band halves") {
    val diverse = "the quick brown fox jumps over seven lazy dogs while birds sing quietly near rivers"
    val d = Seq(
      (1L, diverse),                              // diverse, in-band → keep
      (2L, ("spam " * 40).trim),                  // one token repeated → rep2+dup5 max → drop
      (3L, "tiny doc"))                           // 2 tokens < minTokens → halved
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityEnsemble(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("tier") == "keep")
    val r2 = out(2L)
    assert(r2.getAs[Long]("rep2_bp") == 10000L, "capped boilerplate share")
    assert(r2.getAs[String]("tier") == "drop")
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_tokens") == 2L)
    assert(r3.getAs[String]("tier") != "keep", "out-of-band length halves the score")
    // plan must stay a pure projection
    val plan = TextAnalysis.qualityEnsemble(d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "ensemble gate must not shuffle")
  }

  test("heldOutCrossEntropy: in-model bigrams cost ~0 bits, OOV pays the add-one floor") {
    import graft.operators.Sampling
    // 40 identical 8-word docs (lang 'base') + one guaranteed-val doc of
    // two train-unseen words (lang 'oov'). Train vocab V = 8, so the OOV
    // bigram costs exactly floor(log2(0 + 8 / 0 + 1)) = 3 bits; base
    // bigrams have num/den ratio < 2 throughout → 0 bits.
    val candidates = (1000L to 1100L).map(i => Tuple1(i)).toDF("id")
      .withColumn("split", Sampling.splitTag(col("id"), 0.9))
    val oovId = candidates.filter(col("split") === "val")
      .head().getLong(0)
    val base = (1L to 40L).map(i => (i, "a b c d e f g h", "base"))
    val d = (base :+ ((oovId, "zzz yyy", "oov")))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.heldOutCrossEntropy(d, "text", "doc_id", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val nValBase = d.filter(col("lang") === "base")
      .filter(Sampling.splitTag(col("doc_id"), 0.9) === "val").count()
    val rb = out("base")
    assert(rb.getAs[Long]("n_docs") == nValBase)
    assert(rb.getAs[Long]("total_bits") == 0L)
    val ro = out("oov")
    assert(ro.getAs[Long]("n_docs") == 1L)
    assert(ro.getAs[Long]("n_bigrams") == 1L)
    assert(ro.getAs[Long]("total_bits") == 3L)
    assert(ro.getAs[Long]("avg_millibits") == 3000L)
  }

  test("sparseNeighbors: hand-computed idf weights, dot, cosine; disjoint docs emit nothing") {
    // shingles: doc1 {"a b c","b c d"}, doc2 {"a b c","b c e"}, doc3 disjoint.
    // N=3: w("a b c") = 1·3·100 div 2 = 150, unique shingles → 300.
    // norms 1,2: 150²+300² = 112500; dot(1,2) = 150·150 = 22500
    // → sim = 22500/112500 = 0.2
    val d = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.sparseNeighbors(d, "text", "doc_id").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L),
      "disjoint doc3 has no neighbors and must not appear")
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("rank") == 1L)
    assert(r1.getAs[Long]("neighbor_id") == 2L)
    assert(r1.getAs[Long]("dot") == 22500L)
    assert(math.abs(r1.getAs[Double]("sim") - 0.2) < 1e-12)
  }

  test("sparseNeighbors: maxDf cap silences boilerplate shingles") {
    // the shared shingle lives in 3 docs; with maxDf = 2 it is dropped
    // and nothing else overlaps → no pairs at all
    val d = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.sparseNeighbors(d, "text", "doc_id", maxDf = 2).count() == 0)
    assert(TextAnalysis.sparseNeighbors(d, "text", "doc_id", maxDf = 3).count() == 6)
  }

  test("ngramRepetition: hand-computed Gopher signals") {
    // "a b a b a b c": tokens=7, den = 13 chars
    // 2-grams: "a b"×3, "b a"×2, "b c"×1 → top2 = 3·3 = 9
    // 3-grams: "a b a"×2, "b a b"×2, "a b c"×1 → tie → lexicographically
    //   first of the two count-2 grams = "a b a" → top3 = 2·5 = 10
    // 4-grams: "a b a b"×2, "b a b a"×1, "b a b c"×1 → top4 = 2·7 = 14
    // 5-grams: "a b a b a"×1, "b a b a b"×1, "a b a b c"×1 → no dups → 0
    val d = Seq((1L, "a b a b a b c"), (2L, "x x x x x x"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("den") == 13L)
    assert(r1.getAs[Long]("top2_chars") == 9L)
    assert(r1.getAs[Long]("top3_chars") == 10L)
    assert(r1.getAs[Long]("top4_chars") == 14L)
    assert(r1.getAs[Long]("dup5_chars") == 0L)
    // "x x x x x x": den=11; 5-grams "x x x x x"×2 (both occurrences of
    // the same gram) → dup5 = 2·9 = 18; top2 "x x"×5 → 15
    val r2 = out(2L)
    assert(r2.getAs[Long]("top2_chars") == 15L)
    assert(r2.getAs[Long]("dup5_chars") == 18L)
    assert(r2.getAs[Double]("dup5_ratio") == 18.0 / 11.0)
    // single-token doc: no n-grams at any n → all zeros, den = 4
    val r3 = out(3L)
    assert(r3.getAs[Long]("den") == 4L)
    assert(r3.getAs[Long]("top2_chars") == 0L)
    assert(r3.getAs[Long]("dup5_chars") == 0L)
  }

  test("c4Flags: each rule trips on its own fixture; clean doc keeps") {
    val docs = Seq(
      (1L, "this sentence looks perfectly ordinary and it ends properly."),
      (2L, "too short."),                                   // < 5 words
      (3L, "five ordinary words lacking terminal punctuation here"),
      (4L, "some template leakage here with {placeholder} braces inside."),
      (5L, "please replace this Lorem Ipsum filler before shipping today."),
      (6L, "aa bb cc dd ee ff gg hh ii jj."),               // mean len < 3
      (7L, "")                                              // empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Flags(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("flag_short") && !out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("flag_noterm") && !out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Boolean]("flag_brace") && !out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Boolean]("flag_lorem") && !out(5L).getAs[Boolean]("keep"))
    assert(out(6L).getAs[Boolean]("flag_wordlen") && !out(6L).getAs[Boolean]("keep"))
    // empty doc: 0 words → short + noterm, never a fold error
    assert(out(7L).getAs[Long]("n_words") == 0L)
    assert(out(7L).getAs[Boolean]("flag_short"))
    assert(out(7L).getAs[Boolean]("flag_noterm"))
  }

  test("distinctNgrams: hand-counted per-source bigram diversity") {
    val docs = Seq(
      ("A", "a b a b"), // bigrams: "a b","b a","a b" → 3 total, 2 distinct
      ("A", "x y"),     // +1 total, +1 distinct → A: 4 / 3
      ("B", "w w w"),   // "w w","w w" → 2 total, 1 distinct
      ("B", "z"))       // 1 token → no bigrams, contributes nothing
      .toDF("source", "text")
    val out = TextAnalysis.distinctNgrams(docs, "text", "source", n = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_grams") == 4L)
    assert(out("A").getAs[Long]("n_distinct") == 3L)
    assert(out("A").getAs[Long]("distinct_bp") == 7500L)
    assert(out("B").getAs[Long]("n_grams") == 2L)
    assert(out("B").getAs[Long]("n_distinct") == 1L)
    assert(out("B").getAs[Long]("distinct_bp") == 5000L)
    assert(out.size == 2) // the bigram-less doc created no source row
  }
}
