package graft

/** Empty-input robustness: every catalog query must EXECUTE (not
  * necessarily return rows) against empty copies of all ten tables.
  *
  * At 100 TB an empty slice is routine — a date filter matching
  * nothing, a source with no documents yet, an empty partition after a
  * selective pushdown — and the classic failure modes are exactly the
  * ones a small-fixture smoke never sees: `max(struct)` heads of empty
  * groups fed to element_at, integer `div` by a 0 aggregate, `first()`
  * on an empty frame, a broadcast of an empty offsets table. A query
  * that throws on empty input would take down a whole production run
  * for a data condition, not a bug.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("customer", "documents", "embeddings", "events", "lineitem",
      "nation", "orders", "part", "region", "supplier").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on empty tables") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0)
    }
  }
}
