package graft

import org.apache.spark.sql.functions._
import graft.queries.StatsQueries

/** Invariants of the integer-exact stats queries (the DuckDB oracle
  * proves cross-engine agreement; these pin the semantics).
  */
class StatsSpec extends SparkSpec {

  test("q_decile_lift: 10 deciles partition all orders; lift averages to ~1") {
    val df = StatsQueries.queries("q_decile_lift")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 10)
    val n = rows.map(_.getAs[Long]("n")).sum
    val total = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(n == total)
    // decile sizes differ by at most 1 (SQL-standard NTILE rule)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    // weighted mean of per-decile positive rates = base rate, so the
    // n-weighted mean lift is 10000 bp up to floor-division loss
    val weighted = rows.map(r => r.getAs[Long]("lift_bp") * r.getAs[Long]("n")).sum
    assert(weighted <= 10000L * n && weighted >= 10000L * n - 10 * n)
  }

  test("q_pmi_lift: marginals consistent; independence baseline on a uniform grid") {
    val df = StatsQueries.queries("q_pmi_lift")(spark, sf0001)
    val rows = df.collect()
    // n_x is the sum of this x's cells; re-derive and compare
    val byX = rows.groupBy(_.getAs[String]("x"))
    byX.foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("n_xy")).sum == cells.head.getAs[Long]("n_x"))
    }
    // every lift is nonnegative and floor(n_xy*N*1e6/(n_x*n_y)) exactly
    rows.foreach { r =>
      val (nxy, nx, ny) = (r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"), r.getAs[Long]("n_y"))
      val nn = rows.filter(_.getAs[String]("x") == r.getAs[String]("x"))
        .map(_.getAs[Long]("n_xy")).sum +
        rows.filter(_.getAs[String]("x") != r.getAs[String]("x"))
          .map(_.getAs[Long]("n_xy")).sum
      assert(r.getAs[Long]("lift_ppm") == nxy * nn * 1000000L / (nx * ny))
    }
  }

  test("q_ols_trend semantics: exact slope on a constructed line") {
    import spark.implicits._
    // y = 3.5 + 0.25·day over 5 days, one observation per day:
    // slope = 0.25 units/day = 250000 micro-units/day exactly
    val ts = (0 until 5).map { day =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L)),
        3.5 + 0.25 * day)
    }
    val df = ts.toDF("ts", "value")
      .select(lit("m").as("event_type"), col("ts"), col("value"),
        lit(1L).as("event_id"), lit(1L).as("user_id"), lit("").as("props"))
    // run the same pipeline as the query, inlined on the fixture
    val daily = df.select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 1e6).cast("long").as("vu"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("vu")).as("sq"))
      .select(col("event_type"), col("day"), expr("sq div cnt").as("vq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val g = daily.withColumn("x", col("day") - min(col("day")).over(w))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("vq")).as("sy"), sum(col("x") * col("vq")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", expr("n_days * sxy - sx * sy"))
      .withColumn("den", expr("n_days * sxx - sx * sx"))
      .select(expr("num div den").as("slope_micro"))
    assert(g.collect().head.getAs[Long]("slope_micro") == 250000L)
  }

  test("q_equidepth: 20 buckets partition all events, sizes within 1") {
    val rows = graft.queries.MiscQueries.queries("q_equidepth")(spark, sf0001)
      .collect()
    assert(rows.length == 20)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sum == spark.read.parquet(s"$sf0001/events.parquet").count())
    // buckets are value-ordered: each bucket's hi <= next bucket's lo
    val ordered = rows.sortBy(_.getAs[Long]("bucket"))
    ordered.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
  }

  test("q_mad_outliers: MAD screen survives a spike that masks the z-score") {
    import spark.implicits._
    // 99 values at 10.0 plus one 1e6 spike: mean/sigma are dragged so
    // far that 3-sigma flags nothing... but median=10, MAD=0 — the
    // spike (adev 1e6-10 > 0) flags robustly
    val df = ((1 to 99).map(i => ("m", i.toLong, 10.0)) :+ ("m", 100L, 1e6))
      .toDF("event_type", "event_id", "value")
    val med = graft.queries.rankOrdered(df, "event_type", "value", "event_id")
      .filter(col("rn") === graft.queries.rankIdx(50))
      .select(col("event_type"), col("value").as("med"))
    val dev = df.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = graft.queries.rankOrdered(
        dev.select(col("event_type"), col("event_id"), col("adev")),
        "event_type", "adev", "event_id")
      .filter(col("rn") === graft.queries.rankIdx(50))
      .select(col("event_type"), col("adev").as("mad"))
    val out = dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("adev") > col("mad") * 3).collect()
    assert(out.length == 1 && out.head.getAs[Long]("event_id") == 100L)
  }

  test("q_changepoint semantics: step series peaks |CUSUM| at the step") {
    import spark.implicits._
    // 10,10,10,20,20 → mean 14, cusum -4,-8,-12,-6,0: peak day 2
    val dv = Seq(("m", 0L, 10000000L), ("m", 1L, 10000000L),
      ("m", 2L, 10000000L), ("m", 3L, 20000000L), ("m", 4L, 20000000L))
      .toDF("event_type", "day", "vq")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cusum = dv
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("sy", sum(col("vq")).over(w))
      .withColumn("mean_q", expr("CASE WHEN sy >= 0 THEN sy div n_days ELSE -((-sy) div n_days) END"))
      .withColumn("cusum", sum(col("vq") - col("mean_q")).over(wOrd))
    val top = cusum.orderBy(abs(col("cusum")).desc, col("day")).limit(1)
      .select("day", "cusum").collect().head
    assert(top.getLong(0) == 2L && top.getLong(1) == -12000000L)
  }

  test("q_autocorr semantics: perfect trend r2=1e6 sign +1; alternation sign -1") {
    import spark.implicits._
    def r2(series: Seq[Long]): (Long, Long) = {
      val dv = series.zipWithIndex
        .map { case (v, i) => ("m", i.toLong, v) }.toDF("event_type", "day", "vm")
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val g = dv.withColumn("prev", lag(col("vm"), 1).over(wOrd))
        .filter(col("prev").isNotNull)
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("n_pairs"), sum(col("prev")).as("sx"),
          sum(col("vm")).as("sy"), sum(col("prev") * col("vm")).as("sxy"),
          sum(col("prev") * col("prev")).as("sxx"),
          sum(col("vm") * col("vm")).as("syy"))
        .withColumn("num", expr("n_pairs * sxy - sx * sy"))
        .withColumn("denx", expr("n_pairs * sxx - sx * sx"))
        .withColumn("deny", expr("n_pairs * syy - sy * sy"))
        .select(expr(
          """CAST((CAST(num AS DECIMAL(38,0)) * CAST(num AS DECIMAL(38,0))
            |  * 1000000) div
            |  (CAST(denx AS DECIMAL(38,0)) * CAST(deny AS DECIMAL(38,0)))
            |  AS BIGINT)""".stripMargin).as("r2"),
          signum(col("num")).cast("long").as("sign"))
        .collect().head
      (g.getLong(0), g.getLong(1))
    }
    assert(r2(Seq(1L, 2L, 3L, 4L, 5L)) == (1000000L, 1L))
    assert(r2(Seq(0L, 1L, 0L, 1L)) == (1000000L, -1L))
  }

  test("q_subtree_rollup: root aggregates everything, leaves equal own") {
    val rows = graft.queries.AnalyticsQueries.queries("q_subtree_rollup")(
      spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_own"), r.getAs[Long]("n_subtree"),
          r.getAs[Long]("n_subtree_nodes"))).toMap
    val totalEvents = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("user_id") >= 1).count()
    // root (user 1) sees every event exactly once
    assert(rows(1L)._2 == totalEvents)
    // subtree is always >= own, and strictly decomposes: node's subtree
    // = own + left child's subtree + right child's subtree (0 if absent)
    rows.foreach { case (id, (own, sub, _)) =>
      assert(sub >= own)
      val l = rows.get(2 * id).map(_._2).getOrElse(0L)
      val r = rows.get(2 * id + 1).map(_._2).getOrElse(0L)
      assert(sub == own + l + r, s"node $id")
    }
  }

  test("q_ols_trend on sf0.001: every type has a slope, spans > 1 day") {
    val df = StatsQueries.queries("q_ols_trend")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 1)
      assert(!r.isNullAt(r.fieldIndex("slope_micro_per_day")))
    }
  }
}
