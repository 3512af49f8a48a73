package graft

import org.apache.spark.sql.functions._
import graft.functions.{RollingHash, ZeroModWindows}

/** Pins the native Rabin-Karp window selector bit-equal to the
  * compositional form it replaces: positions i in 1..len-k+1 where
  * `RollingHash(substring(t, i, k)) % p == 0`.
  */
class ZeroModWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def composed(k: Int, p: Int) =
    when(length(col("t")) >= k,
      filter(sequence(lit(1), length(col("t")) - (k - 1)),
        i => RollingHash.rollingHash(col("t").substr(i, lit(k))) % p === 0))
      .otherwise(array().cast("array<int>"))

  private val adversarial = Seq(
    "",                          // empty
    "abc",                       // shorter than k
    "aaaaaaaaaaaaaaaaaaaaaaaa",  // uniform — every window equal
    "the quick brown fox jumps over the lazy dog and keeps running",
    "ab" * 40,                   // period-2 repetition
    "x" + "yz" * 30 + "x",
    "emoji 😀😀 mixed ascii and astral 𝒳𝒴𝒵 codepoints padded out", // astral
    (0 until 200).map(i => ('a' + i % 26).toChar).mkString)

  test("native selection ≡ compositional RollingHash filter on adversarial text") {
    for (k <- Seq(1, 2, 8, 40); p <- Seq(1, 2, 8)) {
      val d = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val rows = d.select(col("id"),
          ZeroModWindows.zeroModWindows(col("t"), k, p).as("native"),
          composed(k, p).as("composed"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"k=$k p=$p id=${r.getLong(0)}")
      }
    }
  }

  test("p=1 selects every window; count matches len-k+1") {
    val d = Seq((1L, "abcdefghij")).toDF("id", "t")
    val out = d.select(size(ZeroModWindows.zeroModWindows(col("t"), 4, 1)))
      .head().getInt(0)
    assert(out == 7)
  }
}
