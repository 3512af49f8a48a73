package graft

import org.apache.spark.sql.functions._
import graft.functions.PcmStats

/** Real PCM16 decode (functions/AudioExpressions.scala): hand-built
  * WAVs with known samples, sign-extension edges, chunk-walk
  * robustness, and strict nulls for everything non-decodable.
  */
class PcmStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("payload")
      .select(PcmStats.pcmStats(col("payload")).as("st"))
      .select(col("st.sample_rate"), col("st.n_samples"), col("st.peak_abs"),
        col("st.sum_abs"), col("st.energy"))
      .collect()(0)

  test("known samples decode exactly, signed edges included") {
    val s = Array[Short](0, 1, -1, 32767, -32768, 100, -100)
    val r = statsOf(PcmStats.wavBytes(16000, s))
    assert(r.getLong(0) == 16000L)
    assert(r.getLong(1) == 7L)
    assert(r.getLong(2) == 32768L) // |-32768| — the sign-extension edge
    val sumAbs = s.map(x => math.abs(x.toLong)).sum
    val energy = s.map(x => x.toLong * x).sum
    assert(r.getLong(3) == sumAbs)
    assert(r.getLong(4) == energy)
  }

  test("unknown chunks before data are skipped by declared size") {
    // splice a LIST chunk (5 bytes + pad to word boundary) between fmt and data
    val base = PcmStats.wavBytes(8000, Array[Short](10, -20, 30))
    val extra = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // body 5 + 1 pad
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field (LE u32 at offset 4)
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte
    spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val r = statsOf(spliced)
    assert(r.getLong(1) == 3L)
    assert(r.getLong(3) == 60L)
  }

  test("non-WAV, non-PCM, truncated, and odd-length payloads are null") {
    val good = PcmStats.wavBytes(16000, Array[Short](1, 2, 3))
    val notRiff = "JUNK".getBytes ++ good.drop(4)
    val truncated = good.dropRight(2) // data chunk shorter than declared
    val nonPcm = good.clone()
    nonPcm(20) = 3 // format tag: IEEE float, not PCM
    val df = Seq(notRiff, truncated, nonPcm, "short".getBytes)
      .toDF("payload")
      .select(PcmStats.pcmStats(col("payload")).as("st"))
    assert(df.filter(col("st").isNotNull).count() == 0)
  }

  test("empty data chunk decodes to zero stats, not null") {
    val r = statsOf(PcmStats.wavBytes(44100, Array.empty[Short]))
    assert(r.getLong(0) == 44100L)
    (1 to 4).foreach(i => assert(r.getLong(i) == 0L))
  }
}
