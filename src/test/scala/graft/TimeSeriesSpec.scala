package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: (String, Long, Long, Double)*) =
    rows.toDF("k", "e", "tie", "v")

  test("resample carries last-by-(epoch,tie) observation per bucket") {
    // bucket 10s: key a, bucket 0 has two obs — e=5 wins over e=3;
    // at equal epochs the higher tie wins
    val df = obs(("a", 3L, 1L, 1.0), ("a", 5L, 1L, 2.0),
      ("a", 5L, 0L, 9.0), ("a", 12L, 1L, 3.0))
    val out = TimeSeries.resampleLastFfill(df, "k", "e", "tie", "v", 10L)
      .orderBy("bucket_start").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((0L, 3L, 2.0), (10L, 1L, 3.0)))
  }

  test("resample forward-fills gaps and leaves leading buckets null") {
    // key with obs in buckets 1 and 4 only: grid 1..4, buckets 2-3
    // inherit bucket 1's value; a second key checks fill is per-key
    val df = obs(("a", 10L, 1L, 5.0), ("a", 40L, 1L, 7.0),
      ("b", 20L, 1L, 1.0))
    val out = TimeSeries.resampleLastFfill(df, "k", "e", "tie", "v", 10L)
    val a = out.filter($"k" === "a").orderBy("bucket_start")
      .select("bucket_start", "obs_cnt", "value_ffill").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((10L, 1L, 5.0), (20L, 0L, 5.0), (30L, 0L, 5.0), (40L, 1L, 7.0)))
    val b = out.filter($"k" === "b").collect()
    assert(b.length == 1 && b.head.getAs[Double]("value_ffill") == 1.0)
  }

  test("resample grid size is keys x span, not input rows") {
    // 1000 rows, one key, span 3 buckets -> 3 output rows
    val big = (1 to 1000).map(i => ("a", (i % 30).toLong, i.toLong, i.toDouble))
    val out = TimeSeries.resampleLastFfill(big.toDF("k", "e", "tie", "v"),
      "k", "e", "tie", "v", 10L)
    assert(out.count() == 3)
  }

  test("scd2 emits change rows with half-open validity intervals") {
    val df = Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "x"), (1L, 30L, 3L, "y"),
      (1L, 40L, 4L, "x"), (2L, 10L, 5L, "z"))
      .toDF("k", "e", "tie", "attr")
    val out = TimeSeries.scd2History(df, "k", "e", "tie", "attr")
      .orderBy("k", "valid_from").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, "x", 10L, Some(30L)), (1L, "y", 30L, Some(40L)),
      (1L, "x", 40L, None), (2L, "z", 10L, None)))
  }

  test("scd2 change detection is null-safe on the attribute") {
    // null -> "x" -> null are all changes; first row always emits
    val df = Seq((1L, 10L, 1L, null), (1L, 20L, 2L, "x"), (1L, 30L, 3L, null))
      .asInstanceOf[Seq[(Long, Long, Long, String)]]
      .toDF("k", "e", "tie", "attr")
    val out = TimeSeries.scd2History(df, "k", "e", "tie", "attr")
    assert(out.count() == 3)
  }

  test("scd2 orders ties deterministically by tie column") {
    // same epoch, attr differs: tie order decides prev/next chain
    val df = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 10L, 3L, "a"))
      .toDF("k", "e", "tie", "attr")
    val out = TimeSeries.scd2History(df, "k", "e", "tie", "attr").collect()
    assert(out.length == 3)
  }

  test("resampleLinear interpolates interior gaps exactly, micro-units") {
    // obs at buckets 0 (v=1.0) and 3 (v=2.5): buckets 1, 2 get
    // 1.0 + (1.5·k/3) → 1500000, 2000000 micro; observed rows pass
    // through quantized
    val df = obs(("a", 5L, 1L, 1.0), ("a", 35L, 1L, 2.5))
    val out = TimeSeries.resampleLinear(df, "k", "e", "tie", "v", 10L)
      .orderBy("bucket_start")
      .select("bucket_start", "obs_cnt", "value_interp_micro").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L, 1000000L), (10L, 0L, 1500000L),
        (20L, 0L, 2000000L), (30L, 1L, 2500000L)))
  }

  test("resampleLinear: downward slope truncates toward zero on both gaps") {
    // obs 2.0 → 0.5 over 3 buckets: exact thirds are non-integers,
    // delta·k = -1500000·{1,2} / 3 → -500000, -1000000 exactly
    val df = obs(("a", 5L, 1L, 2.0), ("a", 35L, 1L, 0.5))
    val out = TimeSeries.resampleLinear(df, "k", "e", "tie", "v", 10L)
      .orderBy("bucket_start").select("value_interp_micro").collect()
    assert(out.map(_.getLong(0)).toSeq ==
      Seq(2000000L, 1500000L, 1000000L, 500000L))
  }

  test("resampleLinear: grid endpoints are observed, so no nulls; per-key isolation") {
    // the grid spans each key's OWN [min, max] observed bucket, so
    // both endpoints are anchors and every gap is interior — the
    // exterior-null branch is defensive only. Key b has a single obs:
    // its one-bucket grid is all-observed.
    val df = obs(("a", 20L, 1L, 1.0), ("a", 30L, 1L, 2.0),
      ("b", 50L, 1L, 9.0))
    val out = TimeSeries.resampleLinear(df, "k", "e", "tie", "v", 10L)
    assert(out.filter($"value_interp_micro".isNull).count() == 0)
    val b = out.filter($"k" === "b").collect()
    assert(b.length == 1 && b.head.getAs[Long]("value_interp_micro") == 9000000L)
  }
}
