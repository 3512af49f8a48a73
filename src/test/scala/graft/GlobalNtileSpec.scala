package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranking

/** Ranking.globalNtile vs Spark's own single-partition ntile — a third
  * implementation of the tile rule next to the DuckDB oracle: every
  * (rows, n) shape must agree, including n larger than the row count
  * (where the distributed form's guarded CASE must not divide by zero)
  * and heavy key ties (where the within-key rank carries the order).
  */
class GlobalNtileSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(Long, Long)], n: Int): Unit = {
    val df = rows.toDF("score", "id")
    val w = Window.orderBy(col("score"), col("id"))
    val expected = df.withColumn("tier", ntile(n).over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val actual = Ranking.globalNtile(df, "score", "id", n)
      .select(col("score"), col("id"), col("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(actual === expected, s"n=$n, rows=${rows.size}")
  }

  test("agrees with built-in ntile across shapes") {
    val data = (1 to 500).map(i => ((i * 37 % 13).toLong, i.toLong))
    for (n <- Seq(1, 2, 4, 7, 499, 500, 501, 1000)) check(data, n)
  }

  test("all rows share one key value") {
    check((1 to 100).map(i => (5L, i.toLong)), 4)
  }

  test("every key unique") {
    check((1 to 97).map(i => (i.toLong, i.toLong)), 5)
  }

  test("single row") {
    check(Seq((1L, 1L)), 3)
  }

  test("globalRank equals the single-window row_number for any bucket count") {
    // heavy ties (13 distinct scores over 500 rows) AND unique keys —
    // rank must be identical whatever the quantile boundaries do
    val data = (1 to 500).map(i => ((i * 37 % 13).toLong, i.toLong))
    val df = data.toDF("score", "id")
    val w = Window.orderBy(col("score"), col("id"))
    val expected = df.withColumn("global_rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (b <- Seq(2, 7, 64)) {
      val actual = Ranking.globalRank(df, "score", Seq("id"), buckets = b)
        .select(col("score"), col("id"), col("global_rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(actual === expected, s"buckets=$b")
    }
    // unique keys: every rank 1..n exactly once
    val uniq = (1 to 97).map(i => (i * 1000L % 97, i.toLong)).toDF("score", "id")
    val ranks = Ranking.globalRank(uniq, "score", Seq("id"))
      .select(col("global_rank")).collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 97L))
  }

  test("high-cardinality key domain fails loudly, not by broadcast OOM") {
    // every key unique: the offset table would be |rows|-sized — the
    // exact shape the bounded-domain precondition exists to reject.
    // The guard is in-plan (raise_error on the offset window pass), so
    // the failure surfaces at materialize time, wrapped by Spark.
    val df = (1 to 5000).map(i => (i.toLong, i.toLong)).toDF("score", "id")
    val e = intercept[Exception] {
      Ranking.globalNtile(df, "score", "id", 4, maxKeys = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("distinct keys"), s"unexpected failure: $all")
    assert(all.contains("maxKeys=1000"))
    // same data under an explicit, deliberate cap still computes
    check((1 to 97).map(i => (i.toLong, i.toLong)), 5)
  }

  test("globalRunningSum agrees with the single-window form across bucket counts") {
    // skewed integer values, shuffled key order, duplicate keys with a
    // tie column carrying the order
    val data = (1 to 400).map(i =>
      ((i * 53 % 40).toLong, i.toLong, ((i * 17) % 97 + 1).toLong))
    val df = data.toDF("k", "id", "v")
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("running_sum", sum(col("v")).over(w))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    for (b <- Seq(2, 8, 64)) {
      val actual = Ranking.globalRunningSum(df, "k", Seq("id"), "v", b)
        .select(col("id"), col("running_sum"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(actual === expected, s"buckets=$b")
    }
  }
}
