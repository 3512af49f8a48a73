package graft

/** Smoke: every registered query runs and returns rows on sf0.001, and
  * every oracle key refers to a real query. (Value-level correctness is
  * the driver's DuckDB gate; scripts/oracle_check.py mirrors it locally.)
  */
class QueriesSmokeSpec extends SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
