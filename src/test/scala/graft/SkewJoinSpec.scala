package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew handling is part of this library's 100 TB story
  * (SCALE.md: "skewed keys → salting or AQE skew-join") — this spec
  * proves the claim executes, not just documents it: a pathologically
  * skewed sort-merge join must come back from AQE with skew-split
  * partitions, and still be exactly correct.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime; results exact") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the fixture-sized skew triggers the rewrite
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on ONE hot key vs 100 rows spread over the rest
      val facts = spark.range(100100)
        .select(when(col("id") < 100000, 0L).otherwise(col("id") % 100 + 1).as("k"),
          col("id").as("payload"))
      val dims = (0L until 101L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = facts.join(dims, Seq("k"))
      // execute THIS DataFrame's own query execution (count() would
      // build a separate one and leave this adaptive plan unfinalized)
      assert(joined.collect().length == 100100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew-split join:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("keyProfile: hand-computed hot-key statistics, hot tie → smallest key") {
    import graft.operators.Skew
    // key 7 → 5 rows, key 1 → 3 rows, key 2 → 2 rows
    val df = (Seq.fill(5)(7L) ++ Seq.fill(3)(1L) ++ Seq.fill(2)(2L))
      .toDF("k")
    val r = Skew.keyProfile(df, "k", topN = 2).collect().head
    assert(r.getLong(r.fieldIndex("n_rows")) == 10L)
    assert(r.getLong(r.fieldIndex("n_keys")) == 3L)
    assert(r.getLong(r.fieldIndex("hot_key")) == 7L)
    assert(r.getLong(r.fieldIndex("hot_rows")) == 5L)
    assert(r.getLong(r.fieldIndex("top_rows")) == 8L)
    assert(r.getLong(r.fieldIndex("hot_share_permille")) == 500L)
    assert(r.getLong(r.fieldIndex("top_share_permille")) == 800L)
    // 5 rows on the hot key vs a fair share of 10/3: 5*3*1000/10 = 1500
    assert(r.getLong(r.fieldIndex("skew_ratio_permille")) == 1500L)
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    import graft.operators.Skew
    // 10k rows on one hot key, a handful elsewhere
    val facts = spark.range(10100)
      .select(when(col("id") < 10000, 7L).otherwise(col("id") % 10).as("k"),
        col("id").as("payload"))
    val dims = (0L until 10L).map(kk => (kk, s"dim_$kk")).toDF("k", "name")
    val plain = facts.join(dims, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(facts, dims, "k", col("payload"), buckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain, "salting must be semantically invisible")
    // the hot key really is spread: every salt bucket gets a share
    val spread = facts.withColumn("_salt", Skew.salt(col("payload"), 8))
      .filter(col("k") === 7L).groupBy("_salt").count().collect()
    assert(spread.length == 8, "all 8 salt buckets populated for the hot key")
    assert(spread.map(_.getLong(1)).max < 10000, "no bucket holds the whole key")
  }
}
