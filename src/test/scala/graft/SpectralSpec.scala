package graft

import org.apache.spark.sql.functions._
import graft.operators.Spectral

/** The integer power iteration's contract: deterministic, normalized,
  * and directionally faithful to a double-precision iteration on the
  * same Gram matrix (quantization bounds the attainable precision —
  * measured, not assumed).
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  // low-rank-ish fixture: vectors clustered around two directions so
  // the dominant eigenvector is well separated (healthy eigengap)
  private def fixture = {
    val rnd = new scala.util.Random(3)
    val base = Array.tabulate(8)(i => math.sin(i * 1.1).toFloat)
    Seq.tabulate(300) { k =>
      val scale = 1.0f + (k % 7) * 0.1f
      val noise = Array.fill(8)((rnd.nextGaussian() * 0.05).toFloat)
      (k.toLong, base.zip(noise).map { case (b, n) => b * scale + n }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("deterministic across runs; normalized to max|v| = 1000") {
    val a = Spectral.dominantEigenvector(fixture, "embedding", 8, 10)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = Spectral.dominantEigenvector(fixture, "embedding", 8, 10)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(t => math.abs(t._2)).max == 1000L)
    assert(a.length == 8)
  }

  test("direction matches a double-precision power iteration (cosine > 0.99)") {
    val df = fixture
    val got = Spectral.dominantEigenvector(df, "embedding", 8, 12)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2.toDouble)
    // double-precision reference on the SAME quantized Gram
    val q = df.select(expr(
        "transform(slice(embedding, 1, 8), x -> CAST(floor(x * 1000) AS BIGINT))")
        .as("q")).as[Seq[Long]].collect()
    val g = Array.ofDim[Double](8, 8)
    q.foreach { row =>
      for (i <- 0 until 8; j <- 0 until 8) g(i)(j) += row(i).toDouble * row(j)
    }
    var v = Array.fill(8)(1.0)
    (1 to 50).foreach { _ =>
      val w = Array.tabulate(8)(i => (0 until 8).map(j => g(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val dot = got.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.99, s"cosine $cos")
  }
}
