package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{BmpPixelStats, KmvBuffer, PcmStats}

/** ScalaCheck properties for the round-8 components, at the buffer /
  * byte level (no Spark jobs — these pin the pure algebra the
  * Spark-level specs then lift):
  * KMV's lossless-union identity under ARBITRARY partitionings, and
  * the encode→decode round trips of both codec-free media decoders
  * over arbitrary payload content.
  */
class SketchDecoderPropertiesSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def sketch(k: Int, vals: Seq[Long]): List[Long] = {
    val b = new KmvBuffer(k)
    vals.foreach(v => b.add(v ^ Long.MinValue))
    val it = b.set.iterator()
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next().longValue()).toList
  }

  test("KMV: merged part-sketches equal the direct sketch for any split") {
    (1L to 30L).foreach { seed =>
      val vals = sample(Gen.listOfN(400, Gen.long), seed)
      val nParts = 1 + (seed % 7).toInt
      val direct = sketch(16, vals)
      val merged = new KmvBuffer(16)
      vals.grouped(math.max(1, vals.size / nParts)).foreach { part =>
        sketch(16, part).foreach(merged.add) // parts' rank keys re-merged
      }
      val it = merged.set.iterator()
      val m = Iterator.continually(it).takeWhile(_.hasNext)
        .map(_.next().longValue()).toList
      assert(m == direct, s"seed $seed: union not lossless")
    }
  }

  test("KMV: sketch is the k smallest distinct rank keys, in order") {
    (1L to 30L).foreach { seed =>
      val vals = sample(Gen.listOfN(100, Gen.chooseNum(-50L, 50L)), seed)
      val got = sketch(8, vals)
      val want = vals.map(_ ^ Long.MinValue).distinct.sorted.take(8)
      assert(got == want, s"seed $seed")
    }
  }

  test("PCM: wavBytes → compute is the identity on sample statistics") {
    (1L to 30L).foreach { seed =>
      val s = sample(Gen.listOfN((seed % 50).toInt,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)), seed)
        .map(_.toShort).toArray
      val r = PcmStats.compute(PcmStats.wavBytes(16000, s))
      assert(r != null)
      assert(r.getLong(1) == s.length.toLong)
      assert(r.getLong(2) == (if (s.isEmpty) 0L else s.map(x => math.abs(x.toLong)).max))
      assert(r.getLong(3) == s.map(x => math.abs(x.toLong)).sum)
      assert(r.getLong(4) == s.map(x => x.toLong * x).sum)
    }
  }

  test("decoders never throw on arbitrary bytes — null or valid, only") {
    (1L to 100L).foreach { seed =>
      val junk = sample(Gen.listOfN((seed % 200).toInt,
        Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)), seed)
        .map(_.toByte).toArray
      PcmStats.compute(junk) // must not throw
      BmpPixelStats.compute(junk)
      // adversarial: valid magics with garbage bodies
      val riffJunk = "RIFF".getBytes ++ junk
      val wavJunk = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
        "WAVE".getBytes ++ junk
      val bmJunk = "BM".getBytes ++ junk
      PcmStats.compute(riffJunk); PcmStats.compute(wavJunk)
      BmpPixelStats.compute(bmJunk)
    }
  }

  test("BMP: bmpBytes → compute is the identity on channel sums") {
    (1L to 30L).foreach { seed =>
      val w = 1 + (seed % 5).toInt
      val h = 1 + ((seed * 3) % 4).toInt
      val px = sample(Gen.listOfN(w * h, for {
        r <- Gen.chooseNum(0, 255); g <- Gen.chooseNum(0, 255)
        b <- Gen.chooseNum(0, 255)
      } yield (r, g, b)), seed).toArray
      val out = BmpPixelStats.compute(BmpPixelStats.bmpBytes(w, h, px))
      assert(out != null)
      assert(out.getLong(0) == w.toLong && out.getLong(1) == h.toLong)
      assert(out.getLong(3) == px.map(_._1.toLong).sum)
      assert(out.getLong(4) == px.map(_._2.toLong).sum)
      assert(out.getLong(5) == px.map(_._3.toLong).sum)
    }
  }
}
