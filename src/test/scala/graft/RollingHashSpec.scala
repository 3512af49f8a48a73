package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins the native RollingHash expression bit-for-bit against the
  * compositional HOF form it replaced — including astral codepoints
  * (Spark's ascii returns the full codepoint, probed: 😀 → 128512) and
  * the empty string.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "",
    "a",
    "hello world",
    "The quick brown fox jumps over the lazy dog 0123456789",
    "punctuation!? and; :symbols #etc",
    "accented éüñ bmp 中文",
    "astral 😀 emoji mixed 🚀 tail",
    " leading and trailing  spaces ",
    "a" * 5000)

  test("native expression equals the HOF composition on every case") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val both = df.select(col("id"),
      TextAnalysis.rollingHash("t").as("native"),
      TextAnalysis.rollingHashComposed("t").as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"mismatch on case ${r.getLong(0)}: ${cases(r.getLong(0).toInt).take(40)}")
    }
  }

  test("whole-stage codegen path and interpreted path agree") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val codegen = df.select(TextAnalysis.rollingHash("t")).collect().map(_.getLong(0))
    val noCodegen = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try df.select(TextAnalysis.rollingHash("t")).collect().map(_.getLong(0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(codegen.toSeq == noCodegen.toSeq)
  }
}
