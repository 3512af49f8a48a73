package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.PipelineConfig
import graft.operators.RefOps
import PipelineConfig.Alerts

/** Property-style invariants (SURVEY.md §5(4)) over generated data —
  * one Spark job per property, ScalaCheck generates the inputs.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("every row lands in exactly window/slide sliding windows") {
    val tss = sample(Gen.listOfN(300, Gen.chooseNum(0L, 10_000_000L)))
    val df = tss.zipWithIndex.map { case (t, i) => (i.toLong, new Timestamp(t * 1000)) }
      .toDF("row_id", "ts")
    val counts = df
      .groupBy(col("row_id"), window(col("ts"), "30 seconds", "10 seconds"))
      .agg(count(lit(1)))
      .groupBy("row_id").agg(count(lit(1)).as("n_windows"))
      .select("n_windows").distinct().collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(3L))
  }

  test("windowed avg is bounded by min/max; count preserved through expansion") {
    val vals = sample(Gen.listOfN(500, Gen.chooseNum(0.0, 100.0)))
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("s" + (i % 5), new Timestamp((i * 7000).toLong), v)
    }.toDF("server_id", "ts", "cpu_pct")
    val agged = RefOps.slidingWindowAgg(df, "server_id",
      Seq(avg("cpu_pct").as("a"), min("cpu_pct").as("lo"), max("cpu_pct").as("hi"),
        count(lit(1)).as("n")))
    val bad = agged.filter(col("a") < col("lo") || col("a") > col("hi")).count()
    assert(bad == 0)
    // every input row appears in exactly 3 windows
    assert(agged.agg(sum("n")).head().getLong(0) == 3L * vals.size)
  }

  test("alert classification is a pure function of the two threshold tests") {
    val pairs = sample(Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0.0, 200.0), Gen.chooseNum(0.0, 200.0))))
    val cfg = PipelineConfig.default
    val df = pairs.zipWithIndex.map { case ((c, m), i) => (i.toLong, c, m) }
      .toDF("id", "cpu", "mem")
    val got = df.select(col("id"), RefOps.classifyAlerts(
        col("cpu"), cfg.cpuThreshold, col("mem"), cfg.memThreshold,
        Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly).as("alert"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.zipWithIndex.foreach { case ((c, m), i) =>
      val expect =
        if (c > cfg.cpuThreshold && m > cfg.memThreshold) Alerts.cpuMemBoth
        else if (c > cfg.cpuThreshold) Alerts.cpuOnly
        else if (m > cfg.memThreshold) Alerts.memOnly
        else Alerts.ok
      assert(got(i.toLong) == expect, s"(c=$c, m=$m)")
    }
  }

  test("binned range join ≡ brute-force range join on random intervals/widths") {
    val ivs = sample(Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 800L))))
      .zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) }
    val pts = sample(Gen.listOfN(300, Gen.chooseNum(0L, 6000L)))
    val ivDf = ivs.toDF("iv_id", "start_s", "end_s")
    val ptDf = pts.toDF("pt")
    val brute = ptDf.crossJoin(ivDf)
      .filter(col("pt") >= col("start_s") && col("pt") < col("end_s"))
      .select("pt", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    for (width <- Seq(1L, 37L, 100L, 1024L)) {
      val got = graft.operators.RangeJoin.pointInInterval(
          ptDf, ivDf, "pt", "start_s", "end_s", binWidth = width)
        .select("pt", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == brute, s"binWidth=$width")
    }
  }

  test("inner USING join row count ≤ min side under key uniqueness") {
    val keys = sample(Gen.listOfN(200, Gen.chooseNum(0, 400))).distinct
    val left = keys.map(k => (s"t$k", "s1", k.toDouble)).toDF("ts", "server_id", "cpu_pct")
    val right = keys.filter(_ % 2 == 0).map(k => (s"t$k", "s1", k.toDouble))
      .toDF("ts", "server_id", "mem_pct")
    val j = RefOps.joinOnKeys(left, right)
    assert(j.count() == keys.count(_ % 2 == 0))
  }

  test("lsum/lavg equal the driver-side micro-unit reference on random doubles") {
    // lsum's exactness claim: floor(x*1e6) long sums are partition-order
    // free and reproduce a sequential BigInt reference bit-for-bit
    // (including the final double divisions)
    val vals = sample(Gen.listOfN(2000, Gen.chooseNum(0.0, 150000.0)))
    val expectSum = vals.map(v => BigInt(math.floor(v * 1e6).toLong)).sum
    val expDouble = expectSum.toDouble / 1e6
    val expAvg = expDouble / vals.size
    val df = vals.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "x")
      .repartition(13) // force multi-partition partial aggregation
    val r = df.agg(graft.queries.lsum(col("x")).as("s"),
      graft.queries.lavg(col("x")).as("a")).head()
    assert(r.getDouble(0) == expDouble)
    assert(r.getDouble(1) == expAvg)
  }

  // Adversarial text generator for the native-vs-compositional profile
  // properties: words with case/accents/digits, separated by runs of
  // mixed whitespace (spaces, tabs, newlines), with optional leading/
  // trailing whitespace — exactly the shapes where a hand-rolled
  // tokenizer could diverge from split(lower(trim(x)), "\s+").
  private def messyTexts(n: Int): List[String] = {
    val word = Gen.oneOf("Key", "AGG", "row", "ScAn", "élan", "x9",
      "the", "π", "a")
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\t\t")
    val text = for {
      k <- Gen.chooseNum(0, 8)
      words <- Gen.listOfN(k, word)
      seps <- Gen.listOfN(math.max(k - 1, 0), ws)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + words.zip(seps :+ "").map { case (w, s) => w + s }.mkString + trail
    sample(Gen.listOfN(n, text))
  }

  test("WordMinHashProfile ≡ compositional profile on adversarial whitespace/unicode") {
    val docs = messyTexts(300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), to_json(col("band_sigs")).as("b"),
          array_sort(col("sh_set")).as("s"), col("n"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Long](2), r.getLong(3))))
        .toMap
    val composed = key(graft.operators.Dedup.dedupProfiles(
      graft.operators.Dedup.rawWordShingles(docs, "text", "doc_id", 3),
      "doc_id", bands = 8, rowsPerBand = 2))
    val native = key(graft.operators.Dedup.wordDedupProfiles(
      docs, "text", "doc_id", 3, bands = 8, rowsPerBand = 2))
    assert(native.keySet == composed.keySet)
    native.keySet.foreach(id => assert(native(id) == composed(id), s"doc $id"))
  }

  test("CharEntropyStats ≡ driver-side frequency fold on adversarial text") {
    val texts = messyTexts(200)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .charDiversity(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def fl2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    texts.zipWithIndex.foreach { case (t, i) =>
      // mirror lower(trim(x)): Spark trim strips ASCII space only
      val norm = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .toLowerCase
      val cps = norm.codePoints().toArray
      if (cps.isEmpty) assert(!got.contains(i.toLong))
      else {
        val m = cps.groupBy(identity).map { case (_, v) => v.length.toLong }
        val want = (cps.length.toLong, m.size.toLong,
          cps.length.toLong * fl2(cps.length.toLong) -
            m.map(c => c * fl2(c)).sum)
        assert(got(i.toLong) == want, s"doc $i '$norm'")
      }
    }
  }

  test("histogramDrift equals a BigInt brute-force L1 on random samples") {
    val width = 100L
    val maxBin = 9
    val rows = sample(org.scalacheck.Gen.listOfN(600, org.scalacheck.Gen.zip(
      org.scalacheck.Gen.oneOf("g1", "g2", "g3"),
      org.scalacheck.Gen.oneOf(true, false),
      org.scalacheck.Gen.chooseNum(0L, 2500L)))) // 2500/100 > 9 → cap hit
    val got = graft.operators.Profiling
      .histogramDrift(rows.toDF("g", "a", "v"), "g", col("a"), "v",
        width, maxBin)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val bins = rs.groupBy(r => math.min(r._3 / width, maxBin.toLong))
      val na = rs.count(_._2).toLong
      val nb = rs.count(!_._2).toLong
      val l1 = bins.values.map { b =>
        (BigInt(b.count(_._2)) * nb - BigInt(b.count(!_._2)) * na).abs
      }.sum
      val ppm = if (na > 0 && nb > 0)
        Some((l1 * 1000000 / (BigInt(na) * nb)).toLong) else None
      assert(got(g) == ((na, nb, ppm, ppm.map(_ >= 300000L))), s"group $g")
    }
  }

  test("hashedLinearScore equals the broadcast weight-table join path") {
    // the scaladoc claim: a trained model swaps in as a broadcast
    // lookup with the same result — pin fold ≡ explode+join+sum
    val words = Seq("the", "FOX!", "123", "éclair", "naïve", "zz",
      "...", "Lorem", "IPSUM", "a")
    val texts = sample(org.scalacheck.Gen.listOfN(80,
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(words))
        .map(_.mkString(" "))))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .hashedLinearScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val wtable = spark.range(256).select(col("id").as("bucket"),
      (col("id") * 2654435761L % 2003L - 1001L).as("w"))
    val joined = docs
      .select(col("doc_id"), explode(filter(
        graft.operators.Dedup.tokens(col("text")), t => t =!= "")).as("tok"))
      .select(col("doc_id"),
        (graft.functions.RollingHash.rollingHash(col("tok")) % 256)
          .as("bucket"))
      .join(broadcast(wtable), Seq("bucket"))
      .groupBy("doc_id").agg(sum("w").as("logit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (n, logit)) =>
      if (n == 0) assert(logit == 0L, s"doc $id")
      else assert(joined(id) == logit, s"doc $id")
    }
  }

  test("EfKernel agrees with an indexOfSlice greedy on random token streams") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // independent reimplementation: longest match at i found by
    // shrinking-window indexOfSlice instead of per-anchor prefix walks
    def naive(art: Vector[String], summ: Vector[String]): (Long, Long, Long) = {
      var i = 0; var m = 0L; var sq = 0L; var f = 0L
      while (i < summ.length) {
        var l = math.min(summ.length - i, art.length)
        while (l > 0 && art.indexOfSlice(summ.slice(i, i + l)) < 0) l -= 1
        if (l > 0) { m += l; sq += l.toLong * l; f += 1; i += l }
        else i += 1
      }
      (m, sq, f)
    }
    def kernel(art: Vector[String], summ: Vector[String]): Seq[Long] = {
      def ad(v: Vector[String]) =
        new GenericArrayData(v.map(UTF8String.fromString).toArray[Any])
      graft.functions.EfKernel.compute(ad(art), ad(summ))
        .toLongArray().toSeq
    }
    val toks = Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.toVector)
    val cases = sample(Gen.listOfN(200, Gen.zip(toks, toks)))
    cases.foreach { case (art, summ) =>
      val Seq(m, sq, f, ns) = kernel(art, summ)
      val (nm, nsq, nf) = naive(art, summ)
      assert((m, sq, f) == ((nm, nsq, nf)), s"art=$art summ=$summ")
      assert(ns == summ.length.toLong)
      assert(m <= ns && f <= m && sq <= m * m)
      assert((m == 0L) == (f == 0L))
    }
  }

  test("aucStats midrank symmetry: AUC(s) + AUC(−s) = 1 exactly") {
    // with midranks, P(s⁺>s⁻) + P(s⁺<s⁻) + P(=) = 1 and each side gets
    // half the ties, so num(s) + num(−s) == den — an exactness theorem
    // the ½-tie handling must satisfy on ANY data
    val rows = sample(Gen.listOfN(300,
      Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.chooseNum(0L, 20L),
        Gen.oneOf(true, false))))
    val df = rows.toDF("grp", "score", "label")
    val neg = df.selectExpr("grp", "-score AS score", "label")
    def nums(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Annotation.aucStats(d, "grp", "score", "label")
        .collect().map(r => r.getString(0) ->
          (r.getAs[String]("auc_num").toLong,
            r.getAs[String]("auc_den").toLong)).toMap
    val fwd = nums(df)
    val rev = nums(neg)
    fwd.foreach { case (g, (n1, d1)) =>
      val (n2, d2) = rev(g)
      assert(d1 == d2, g)
      assert(n1 + n2 == d1, s"$g: $n1 + $n2 != $d1")
      assert(n1 >= 0 && n1 <= d1 || d1 == 0, g)
    }
  }

  test("chatRender length accounting balances on random documents") {
    val docs = sample(Gen.listOfN(120,
      Gen.listOf(Gen.oneOf("alpha", "b", "gamma7", "dd")).map(_.mkString(" "))))
    val t = 4
    val out = graft.operators.TextAnalysis.chatRender(
        docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("doc_id", "text"), "text", "doc_id", turnTokens = t)
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.zipWithIndex.foreach { case (text, i) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = toks.grouped(t).map(_.mkString(" ")).toSeq
      val r = out(i.toLong)
      val n = chunks.size
      assert(r.getAs[Long]("n_turns") == n.toLong, s"doc $i")
      val content = chunks.map(_.length.toLong).sum
      val nUser = (n + 1) / 2
      val nAsst = n / 2
      // rendered_len = content + user tags + assistant tags + end tags
      assert(r.getAs[Long]("rendered_len") ==
        content + 8L * nUser + 13L * nAsst + 7L * n, s"doc $i")
      // the loss mask is exactly the assistant content
      val asst = chunks.zipWithIndex.collect {
        case (c, j) if j % 2 == 1 => c.length.toLong }.sum
      assert(r.getAs[Long]("mask_total") == asst, s"doc $i")
      assert(r.getAs[Boolean]("valid") == (n >= 2 && n % 2 == 0), s"doc $i")
    }
  }

  test("invisibleScan strip ∘ inject ≡ id on random payloads incl. astral") {
    // inject a random mix of all three audited classes (BMP zero-width/
    // bidi/control AND astral TAG codepoints) at random positions into
    // clean ASCII text: the scan must count exactly what was injected,
    // per class, and `cleaned` must reproduce the original — the
    // generative twin of q_invisible_scan's planted-payload oracle
    val invis = Seq(0x200B, 0x200C, 0x200D, 0xFEFF, 0xAD, 0x2060, 0x2063,
      0x180E, 0xE0001, 0xE0041, 0xE007F)
    val bidi = Seq(0x202A, 0x202E, 0x2066, 0x2069, 0x200E, 0x200F, 0x61C)
    val ctrl = Seq(0x00, 0x08, 0x0B, 0x1F, 0x7F)
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    // 0..8 injections (0 exercises the clean=true branch); each carries
    // its own pool index so EVERY pool entry — including the astral TAG
    // codepoints at the tail of `invis` — is reachable
    val payload = Gen.chooseNum(0, 8).flatMap(k => Gen.listOfN(k,
      Gen.zip(Gen.oneOf(Seq(0, 1, 2)), Gen.chooseNum(0, 6),
        Gen.chooseNum(0, 10))))
    val cases = sample(Gen.listOfN(40, Gen.zip(
      Gen.listOfN(7, word), payload)))
    val rows = cases.zipWithIndex.map { case ((words, inj), i) =>
      val clean = words.mkString(" ")
      var n = Array(0L, 0L, 0L)
      val sb = new StringBuilder
      val slots = inj.groupBy(_._2) // word index -> injections after it
      words.zipWithIndex.foreach { case (w, wi) =>
        if (wi > 0) sb.append(' ')
        sb.append(w)
        slots.getOrElse(wi, Nil).foreach { case (cls, _, pi) =>
          val pool = Seq(invis, bidi, ctrl)(cls)
          sb.appendAll(Character.toChars(pool(pi % pool.size)))
          n(cls) += 1
        }
      }
      (i.toLong, sb.toString, clean, n(0), n(1), n(2))
    }
    // generator sanity: the astral entries and the clean branch must
    // actually occur in the sampled cases, or the property is hollow
    assert(rows.exists(_._2.exists(Character.isSurrogate)), "no astral case")
    assert(rows.exists(r => r._4 + r._5 + r._6 == 0L), "no clean case")
    val out = graft.operators.TextAnalysis.invisibleScan(
        rows.map(r => (r._1, r._2)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.foreach { case (id, _, clean, ni, nb, nc) =>
      val r = out(id)
      assert(r.getAs[Long]("n_invisible") == ni, s"doc $id invisible")
      assert(r.getAs[Long]("n_bidi") == nb, s"doc $id bidi")
      assert(r.getAs[Long]("n_ctrl") == nc, s"doc $id ctrl")
      assert(r.getAs[String]("cleaned") == clean, s"doc $id cleaned")
      assert(r.getAs[Boolean]("clean") == (ni + nb + nc == 0L), s"doc $id")
    }
  }

  test("luhnScan validity agrees with an independent digit fold") {
    val digits = Gen.chooseNum(13, 19).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 9)).map(_.mkString))
    val runs = sample(Gen.listOfN(60, digits))
    def fold(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (ch, k) =>
        val d = ch - '0'
        if (k % 2 == 0) d else { val x = 2 * d; if (x > 9) x - 9 else x }
      }.sum % 10 == 0
    val out = graft.operators.TextAnalysis.luhnScan(
        runs.zipWithIndex.map { case (s, i) => (i.toLong, s"pay $s now") }
          .toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_luhn_valid")).toMap
    runs.zipWithIndex.foreach { case (s, i) =>
      assert(out(i.toLong) == (if (fold(s)) 1L else 0L), s"run $s")
    }
  }

  test("nearest_centroid equals a driver-side replay on generated vectors (ties included)") {
    import graft.functions.VectorFunctions.nearest_centroid
    // small integer coordinates over few dims force plenty of EXACT
    // cosine ties, so the lowest-id rule is genuinely exercised — the
    // replay below uses the identical fold/divide order and
    // Double.compare, per the expression's parity contract
    val dim = 3
    val vecs = sample(Gen.listOfN(300,
      Gen.listOfN(dim, Gen.chooseNum(-2, 2).map(_.toDouble))))
      .filter(_.exists(_ != 0.0))
    val cents = vecs.take(12).zipWithIndex.map { case (v, i) => (i * 3L + 1, v) }
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def nrm(a: Seq[Double]) = math.sqrt(dot(a, a))
    val expect = rows.map { case (id, v) =>
      var bestId = 0L; var best = 0.0; var found = false
      cents.foreach { case (cid, cv) =>
        val s = dot(v, cv) / (nrm(v) * nrm(cv))
        if (!found || java.lang.Double.compare(s, best) > 0) {
          found = true; best = s; bestId = cid
        }
      }
      id -> bestId
    }.toMap
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(graft.functions.VectorFunctions.vec_dot(col("v"), col("v"))))
    val centsArr = sort_array(array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("centroid_id"),
        array(cv.map(lit): _*).cast("array<double>").as("centv"),
        lit(nrm(cv)).as("centnorm"))
    }: _*))
    val got = df.select(col("vec_id"),
        nearest_centroid(col("v"), col("n"), centsArr).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the tie rule actually fired somewhere (anti-vacuity): with ±2
    // integer grids over 3 dims, collinear vectors guarantee exact ties
    val tieCount = rows.count { case (_, v) =>
      cents.count { case (_, cv) =>
        java.lang.Double.compare(dot(v, cv) / (nrm(v) * nrm(cv)),
          cents.map { case (_, c2) => dot(v, c2) / (nrm(v) * nrm(c2)) }.max) == 0
      } > 1
    }
    assert(tieCount > 0, "generator produced no exact ties — weaken the grid")
  }

  test("pq_encode equals a driver-side subspace argmin on generated long vectors") {
    import graft.functions.VectorFunctions.pq_encode
    val dim = 8; val m = 4
    val vecs = sample(Gen.listOfN(250,
      Gen.listOfN(dim, Gen.chooseNum(-5L, 5L))))
    val cents = vecs.take(6).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val sub = dim / m
    val expect = vecs.zipWithIndex.map { case (v, i) =>
      i.toLong -> (0 until m).map { s =>
        cents.map { case (cid, cv) =>
          val d = (s * sub until s * sub + sub)
            .foldLeft(0L) { (acc, j) => val df0 = v(j) - cv(j); acc + df0 * df0 }
          (d, cid)
        }.min._2 // (dist, cid) lexicographic min = strict-< lowest-cid rule
      }.toSeq
    }.toMap
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "qe")
    val centsArr = sort_array(array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("qc"))
    }: _*))
    val got = df.select(col("vec_id"), pq_encode(col("qe"), centsArr, m).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == expect)
  }
}
