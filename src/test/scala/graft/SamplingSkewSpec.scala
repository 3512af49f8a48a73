package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Sampling, Skew}

class SamplingSkewSpec extends SparkSpec {
  import spark.implicits._

  test("hash split: deterministic, partition-invariant, ~fraction sized") {
    val df = (0L until 2000L).toDF("id")
    val tagged = df.withColumn("split", Sampling.splitTag(col("id"), 0.9))
    val counts = tagged.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1700 && counts("train") < 1900) // ~90% ± noise
    // repartitioning must not change any row's split
    val again = df.repartition(7)
      .withColumn("split", Sampling.splitTag(col("id"), 0.9))
    assert(tagged.except(again).count() == 0)
    // sample == the train side of the same cut
    assert(Sampling.hashSample(df, "id", 0.9).count() == counts("train"))
  }

  test("hash sample boundary fractions: 1.0 keeps all, 0.0 keeps none") {
    val df = (0L until 500L).toDF("id")
    assert(Sampling.hashSample(df, "id", 1.0).count() == 500)   // not ~1/16
    assert(Sampling.hashSample(df, "id", 1.5).count() == 500)
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
    val tags = df.withColumn("s", Sampling.splitTag(col("id"), 1.0))
      .select("s").distinct().collect().map(_.getString(0)).toSeq
    assert(tags == Seq("train"))
  }

  test("stratified sample: per-stratum cut, coherent with hashSample") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.5, "zh" -> 0.25), defaultFraction = 0.1)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each stratum ~fraction of its 1000 rows (hash noise bounded)
    assert(counts("en") > 400 && counts("en") < 600)
    assert(counts("zh") > 180 && counts("zh") < 320)
    assert(counts("fr") > 60 && counts("fr") < 140)
    // membership within a stratum is exactly hashSample at that fraction
    val enKept = kept.filter(col("lang") === "en").select("id")
    val enExpected = Sampling.hashSample(df.filter(col("lang") === "en"), "id", 0.5)
      .select("id")
    assert(enKept.except(enExpected).count() == 0)
    assert(enExpected.except(enKept).count() == 0)
  }

  test("weighted sample: min-ticket draw matches reference md5, partition-invariant") {
    val df = Seq((1L, 1L), (2L, 3L), (3L, 5L), (4L, 2L), (5L, 4L))
      .toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    // reference recomputation of every draw on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val draws = Seq(1L -> 1L, 2L -> 3L, 3L -> 5L, 4L -> 2L, 5L -> 4L).map {
      case (id, w) => (id, w, (0L until w).map(j => md5hex(s"$id|$j")).min)
    }
    val expect = draws.sortBy(d => (d._3, d._1)).take(3)
    assert(out.sortBy(d => (d._3, d._1)).toSeq == expect)

    // pure function of (id, w): repartitioning changes nothing
    val again = Sampling.weightedSample(df.repartition(7), "id", "w", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.sortBy(d => (d._3, d._1)).toSeq == expect)

    // weight monotonicity in expectation: a heavy row wins the top spot
    // against many light rows more often than 1/n — statistical, so use
    // an extreme ratio and just assert the heavy row is SELECTED here
    val skewed = ((1L to 50L).map(_ -> 1L) :+ (99L -> 500L)).toDF("id", "w")
    val picked = Sampling.weightedSample(skewed, "id", "w", k = 5)
      .select("id").as[Long].collect().toSet
    assert(picked.contains(99L))
  }

  test("salted aggregation equals single-phase aggregation exactly") {
    val ev = Tables.events(spark, sf0001)
    val salted = Skew.saltedSumCount(ev, Seq("event_type"), "value",
        col("event_id"), buckets = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted == plain) // bit-equal: decimal partials are associative
  }

  test("balancedMixture matches a driver-side md5 reference on skewed strata") {
    // 60 'big' docs, 12 'small' docs → big's cut = 12*65536 div 60
    val rows = (1L to 60L).map(i => (i, "big")) ++ (101L to 112L).map(i => (i, "small"))
    def md5hex4(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(2).map(b => f"$b%02x").mkString
    }
    val byStratum = rows.groupBy(_._2)
    val minN = byStratum.values.map(_.size).min.toLong
    val expected = byStratum.map { case (st, rs) =>
      val cut = minN * 65536L / rs.size
      val cut5 = f"$cut%05x"
      val kept = rs.count { case (id, _) => ("0" + md5hex4(id.toString)) < cut5 }
      st -> ((rs.size.toLong, kept.toLong))
    }
    val got = Sampling.balancedMixture(rows.toDF("doc_id", "stratum"),
        "stratum", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the smallest stratum's threshold is "10000" > every "0xxxx" key
    assert(got("small") == ((12L, 12L)), "rate-1.0 stratum keeps everything")
  }

  test("rendezvous sharding: minimal movement when the shard count grows") {
    val ids = (1L to 2000L).toDF("id")
    def assign(n: Int) = ids
      .select(col("id"), Sampling.rendezvousShard(col("id"), n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at8 = assign(8)
    val at9 = assign(9)
    assert(at8.values.toSet.subsetOf((0L to 7L).toSet))
    // THE rendezvous property: every key that moved, moved TO the new
    // shard — nothing reshuffles among the old ones (mod-hash moves ~8/9)
    val moved = at8.keys.filter(k => at8(k) != at9(k)).toSeq
    assert(moved.nonEmpty && moved.forall(k => at9(k) == 8L))
    // expected 1/9 of keys move; allow a generous band around it
    assert(moved.size > 2000 / 20 && moved.size < 2000 / 4,
      s"${moved.size} moved of 2000 — far from the 1/9 expectation")
    // hash-uniform balance: no shard under 1/3 or over 3x of fair share
    val byShard = at8.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.values.forall(n => n > 250 / 3 && n < 750))
    // determinism + partition independence
    assert(assign(8) == at8)
  }
}
