package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, RangeJoin}

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("tableProfile reports nulls, distincts and min/max per column") {
    val df = Seq((1L, Some("a")), (2L, None), (2L, Some("c")))
      .toDF("id", "tag")
    val out = Profiling.tableProfile(df, Seq("id", "tag"))
      .orderBy("col_name").collect()
    val id = out(0); val tag = out(1)
    assert(id.getString(0) == "id" && id.getLong(1) == 3 &&
      id.getLong(2) == 3 && id.getLong(3) == 2 &&
      id.getString(4) == "1" && id.getString(5) == "2")
    assert(tag.getString(0) == "tag" && tag.getLong(2) == 2 &&
      tag.getLong(3) == 2 && tag.getString(4) == "a" && tag.getString(5) == "c")
  }

  test("zScoreOutliers flags exactly the >k-sigma rows") {
    // nine 10s and one 100: mean 19, the 100 is ~2.85 sigma (pop) out —
    // flagged at k=2, not at k=3
    val vals = (Seq.fill(9)(10L) :+ 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
    val df = vals.toDF("id", "g", "qv")
    assert(Profiling.zScoreOutliers(df, "g", "qv", 2)
      .select("qv").as[Long].collect().toSeq == Seq(100L))
    assert(Profiling.zScoreOutliers(df, "g", "qv", 3).count() == 0)
  }

  test("zScoreOutliers is per-group") {
    // the same value is an outlier in a tight group, normal in a wide one
    val tight = (1 to 20).map(i => (i.toLong, "tight", 50L + (i % 2))) :+ (99L, "tight", 90L)
    val wide = (1 to 20).map(i => (200L + i, "wide", (i * 10).toLong)) :+ (199L, "wide", 90L)
    val out = Profiling.zScoreOutliers((tight ++ wide).toDF("id", "g", "qv"), "g", "qv", 3)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(99L))
  }

  test("intervalOverlap matches each overlapping pair exactly once") {
    // left spans 3 bins (width 10): overlaps right once despite sharing
    // 2 bins with it
    val left = Seq((1L, 0L, 30L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 15L, 40L), (11L, 35L, 45L), (12L, 100L, 110L))
      .toDF("rid", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", 10L)
      .select("lid", "rid").collect()
    // (1,10): overlap [15,30), shared bins 1 and 2 -> exactly one row;
    // (1,11) and (1,12): no overlap
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
  }

  test("intervalOverlap: touching half-open intervals do not overlap") {
    val left = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((2L, 10L, 20L)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", 5L)
      .count() == 0)
  }

  test("intervalOverlap handles intervals shorter than a bin") {
    val left = Seq((1L, 3L, 4L)).toDF("lid", "ls", "le")
    val right = Seq((2L, 1L, 9L)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", 100L)
      .count() == 1)
  }

  test("histogramDrift: identical sides → 0 ppm; disjoint bins → 2M ppm") {
    // group g1: both sides put 2 rows in bin 0 and 1 row in bin 1 → L1 = 0.
    // group g2: side A all in bin 0, side B all in bin 2 → L1 = 2 (max).
    val rows = Seq(
      ("g1", true, 5L), ("g1", true, 15L), ("g1", true, 105L),
      ("g1", false, 7L), ("g1", false, 17L), ("g1", false, 107L),
      ("g2", true, 5L), ("g2", true, 15L),
      ("g2", false, 205L), ("g2", false, 215L), ("g2", false, 225L))
      .toDF("g", "a", "v")
    val out = Profiling.histogramDrift(rows, "g", col("a"), "v",
        binWidth = 100L, maxBin = 9)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.get(3), r.get(4))).toMap
    assert(out("g1") == ((3L, 3L, 0L, false)))
    assert(out("g2") == ((2L, 3L, 2000000L, true)))
  }

  test("histogramDrift: an empty side yields NULL drift, not zero") {
    val rows = Seq(("g", true, 5L), ("g", true, 15L)).toDF("g", "a", "v")
    val r = Profiling.histogramDrift(rows, "g", col("a"), "v", 100L, 9).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("histogramDrift caps overflow bins at maxBin") {
    // values past maxBin·width all land in the cap bin on both sides
    val rows = Seq(("g", true, 100000L), ("g", false, 999999L))
      .toDF("g", "a", "v")
    val r = Profiling.histogramDrift(rows, "g", col("a"), "v", 100L, 9).head()
    assert(r.get(3) == 0L) // same (capped) bin → no drift
  }

  test("kAnonymity: rare combinations flagged, corpus risk share in bp") {
    // combos: (en, a) ×6 safe; (en, b) ×3 at risk; (de, a) ×1 at risk
    // → risk rows 4 of 10 → 4000 bp on every row
    val rows = (Seq.fill(6)(("en", "a")) ++ Seq.fill(3)(("en", "b")) ++
        Seq(("de", "a")))
      .toDF("lang", "source")
    val out = Profiling.kAnonymity(rows,
        Seq("lang" -> col("lang"), "source" -> col("source")), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(out(("en", "a")) == ((6L, false, 4000L)))
    assert(out(("en", "b")) == ((3L, true, 4000L)))
    assert(out(("de", "a")) == ((1L, true, 4000L)))
  }
}
