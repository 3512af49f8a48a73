package graft

/** Single-row robustness: every catalog query must EXECUTE against
  * one-row copies of all ten tables — the degenerate-but-nonempty
  * sibling of EmptyInputSpec. One row exercises paths empties skip:
  * variance over n = 1 (n−1 denominators), self-joins whose only pair
  * is the diagonal, windows with a single frame, percentile ranks on a
  * singleton, split/sample cuts that round to zero rows.
  */
class OneRowInputSpec extends SparkSpec {

  private lazy val oneRowDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-onerow").toString
    Seq("customer", "documents", "embeddings", "events", "lineitem",
      "nation", "orders", "part", "region", "supplier").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").limit(1)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on one-row tables") {
      val n = fn(spark, oneRowDir).count()
      assert(n >= 0)
    }
  }
}
