package graft

import graft.operators.Bpe

/** Pins Bpe.merges against a straightforward driver-side reference BPE
  * (mutable greedy left-to-right merge per word). The DuckDB oracle
  * proves cross-engine agreement; this proves the distributed
  * windows+parity formulation IS greedy BPE.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: word-count BPE, greedy left-to-right application. */
  private def refBpe(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var tbl: Map[Vector[String], Long] =
      words.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), pc) = counts.toSeq.minBy { case ((l, r), pc) => (-pc, l, r) }
        out += ((l, r, pc))
        tbl = tbl.groupBy { case (syms, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        }.map { case (k, vs) => k -> vs.values.sum }
      }
    }
    out.result()
  }

  private def run(docs: Seq[String], rounds: Int): Seq[(String, String, Long)] =
    Bpe.merges(docs.toDF("text"), "text", rounds)
      .orderBy("merge_round")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def words(docs: Seq[String]): Map[String, Long] =
    docs.flatMap("[a-z]+".r.findAllIn(_)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }

  test("matches reference BPE incl. self-pair runs (greedy parity)") {
    // 'aaaa' exercises the (A,A) island parity: 3 candidate positions,
    // 2 non-overlapping merges; round 2 then sees the 'aa aa' pair.
    val docs = Seq("aaaa aaaa bb", "aaaa low lower", "low bb aaaa")
    assert(run(docs, 5) == refBpe(words(docs.map(_.toLowerCase)), 5))
  }

  test("matches reference BPE on english-like text with ties") {
    // shared prefixes/suffixes force count ties → the (count, l, r)
    // total order decides; both sides must agree exactly
    val docs = Seq(
      "the cat sat on the mat", "the hat and the bat", "cats eat rats",
      "that hat is flat", "matting and batting")
    assert(run(docs, 8) == refBpe(words(docs), 8))
  }

  test("multi-char merged symbols keep matching (no substring aliasing)") {
    // after 'a'+'b' -> 'ab', a literal adjacent pair ('ab','c') must
    // only match symbol-wise, never inside 'abc'-the-string
    val docs = Seq("abab abc abc abc cab")
    assert(run(docs, 6) == refBpe(words(docs), 6))
  }

  /** Reference encoder: greedy left-to-right application of the trained
    * table in round order, per word.
    */
  private def refEncode(doc: String, table: Seq[(String, String)]): Seq[String] =
    "[a-z]+".r.findAllIn(doc.toLowerCase).toSeq.flatMap { w =>
      var syms = w.toVector.map(_.toString)
      table.foreach { case (l, r) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.result()
      }
      syms
    }

  private def checkEncode(docs: Seq[String], rounds: Int): Unit = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val table = refBpe(words(docs), rounds).map { case (l, r, _) => (l, r) }
    val got = Bpe.encode(df, "text", "doc_id",
        Bpe.merges(df, "text", rounds), rounds)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.zipWithIndex.foreach { case (doc, i) =>
      val toks = refEncode(doc, table)
      val nWords = "[a-z]+".r.findAllIn(doc.toLowerCase).size.toLong
      if (nWords == 0) assert(!got.contains(i.toLong))
      else assert(got(i.toLong) == ((nWords, toks.size.toLong, toks.mkString(" "))),
        s"doc $i: $doc")
    }
  }

  test("encode applies the trained table like the reference encoder") {
    checkEncode(Seq(
      "the cat sat on the mat", "the hat and the bat", "cats eat rats",
      "that hat is flat", "matting and batting"), 8)
  }

  test("encode handles self-pair runs and merged-symbol adjacency") {
    checkEncode(Seq("aaaa aaaa bb", "abab abc abc", "aaaa low lower", "123 !!"), 5)
  }

  test("property: random {a,b,c}-corpora match reference BPE") {
    // tiny alphabet maximizes self-pair runs, ties, and re-merge
    // collisions per word — the adversarial regime for the
    // islands+parity formulation. Deterministic seed, 5 corpora.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, doc))
    (1 to 5).foreach { i =>
      val docs = corpus.apply(Gen.Parameters.default, Seed(i.toLong)).get
      assert(run(docs, 5) == refBpe(words(docs), 5), s"corpus seed $i: $docs")
    }
  }
}
