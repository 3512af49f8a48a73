package graft

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** The custom physical as-of join (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) against the window-composition twin and hand-computed
  * fixtures: same semantics, independent execution paths.
  */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("physical as-of join matches the hand-computed fixture (outer)") {
    val probes = Seq(
      (1L, ts(50), "u1", 0.5),   // before any state → null
      (2L, ts(100), "u1", 0.6),  // exactly at state(100) → 10.0
      (3L, ts(150), "u1", 0.7),  // between → 10.0
      (4L, ts(250), "u1", 0.8),  // after state(200) → 20.0
      (5L, ts(250), "u2", 0.9)   // other key, no states → null
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(
      ("u1", ts(100), 10.0), ("u1", ts(200), 20.0)
    ).toDF("user_id", "ts", "sval")

    val out = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(10.0))
    assert(out(3L).contains(10.0))
    assert(out(4L).contains(20.0))
    assert(out(5L).isEmpty)
  }

  test("inner form drops unmatched probes; outer keeps them") {
    val probes = Seq(
      (1L, ts(10), "u1", 0.0), (2L, ts(300), "u1", 0.0),
      (3L, ts(300), "zz", 0.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(("u1", ts(100), 1.0)).toDF("user_id", "ts", "sval")

    val inner = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
      Seq("sval"), inner = true)
    assert(inner.select("event_id").as[Long].collect().toSet == Set(2L))
    val outer = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
    assert(outer.count() == 3)
  }

  test("physical ≡ composition on randomized data (ties, gaps, missing keys)") {
    val rnd = new Random(42)
    val probes = Seq.tabulate(600) { i =>
      (i.toLong, ts(rnd.nextInt(50)), s"k${rnd.nextInt(25)}", rnd.nextDouble())
    }.toDF("event_id", "ts", "user_id", "value")
    // states distinct on (key, ts): at-ts ties across engines are
    // deterministic only with a unique state per (key, ts)
    val states = Seq.tabulate(400) { i =>
      (s"k${rnd.nextInt(30)}", ts(rnd.nextInt(50)), i.toDouble)
    }.distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts", "sval")

    val viaExec = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
    val viaWindow = AsOfJoin.asOf(probes, states, Seq("user_id"), "ts", Seq("sval"))
    val a = viaExec.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = viaWindow.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length == 600)
    assert(a.toSeq == b.toSeq)
  }

  test("NULL keys and NULL times never match (SQL equality semantics)") {
    val probes = Seq(
      (1L, Some(ts(100)), Some("u1")),
      (2L, Some(ts(100)), Option.empty[String]), // null key probe
      (3L, Option.empty[Timestamp], Some("u1"))  // null time probe
    ).toDF("event_id", "ts", "user_id")
    val states = Seq(
      (Some("u1"), Some(ts(50)), 1.0),
      (Option.empty[String], Some(ts(10)), 2.0), // null key state
      (Some("u1"), Option.empty[Timestamp], 3.0) // null time state
    ).toDF("user_id", "ts", "sval")

    val out = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(1.0)) // matches only the non-null state
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("multi-column keys co-partition and merge correctly") {
    val probes = Seq(
      (1L, ts(100), "a", 1, 0.0), (2L, ts(100), "a", 2, 0.0),
      (3L, ts(100), "b", 1, 0.0)
    ).toDF("event_id", "ts", "k1", "k2", "value")
    val states = Seq(
      ("a", 1, ts(90), 11.0), ("a", 2, ts(90), 12.0), ("b", 2, ts(90), 22.0)
    ).toDF("k1", "k2", "ts", "sval")

    val out = AsOfJoin.asOfExec(probes, states, Seq("k1", "k2"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(5))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).contains(12.0))
    assert(out(3L).isEmpty) // (b,1) has no state
  }

  test("empty state side: outer null-extends every probe") {
    val probes = Seq((1L, ts(1), "u1", 0.0)).toDF("event_id", "ts", "user_id", "value")
    val states = Seq.empty[(String, Timestamp, Double)].toDF("user_id", "ts", "sval")
    val out = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
    assert(out.count() == 1)
    assert(out.filter(col("asof_sval").isNull).count() == 1)
  }

  test("the plan actually contains the custom operator and co-partitioning sorts") {
    val probes = Seq((1L, ts(1), "u1", 0.0)).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(("u1", ts(1), 1.0)).toDF("user_id", "ts", "sval")
    val df = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom node missing from plan:\n$plan")
  }

  test("self-as-of over one scan: shared attribute ids are de-conflicted") {
    val ev = Seq(
      (1L, ts(10), "u1", "signup", 5.0),
      (2L, ts(20), "u1", "click", 0.0),
      (3L, ts(30), "u1", "signup", 7.0),
      (4L, ts(40), "u1", "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val probes = ev.select("event_id", "ts", "user_id")
    val states = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value".as("sval"))
    val out = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(5.0))
    assert(out(2L).contains(5.0))
    assert(out(3L).contains(7.0))
    assert(out(4L).contains(7.0))
  }

  test("forward direction: nearest state at-or-after; exactly-at matches") {
    val probes = Seq(
      (1L, ts(50), "u1", 0.0),   // next state at 100 → 10.0
      (2L, ts(100), "u1", 0.0),  // exactly at state(100) → 10.0
      (3L, ts(150), "u1", 0.0),  // next state at 200 → 20.0
      (4L, ts(250), "u1", 0.0),  // nothing after → null
      (5L, ts(50), "u2", 0.0)    // no states for key → null
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(
      ("u1", ts(100), 10.0), ("u1", ts(200), 20.0)
    ).toDF("user_id", "ts", "sval")

    val out = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
        Seq("sval"), forward = true)
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L).contains(10.0))
    assert(out(2L).contains(10.0))
    assert(out(3L).contains(20.0))
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
  }

  test("forward ≡ brute-force min_by on randomized data") {
    val rnd = new Random(7)
    val probes = Seq.tabulate(400) { i =>
      (i.toLong, ts(rnd.nextInt(40)), s"k${rnd.nextInt(15)}")
    }.toDF("event_id", "ts", "user_id")
    val states = Seq.tabulate(250) { i =>
      (s"k${rnd.nextInt(20)}", ts(rnd.nextInt(40)), i.toDouble)
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts", "sval")

    val viaExec = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
      Seq("sval"), forward = true)
    // brute force: per probe, the state with min ts among ts >= probe.ts
    val brute = probes.as("p")
      .join(states.as("s"),
        $"p.user_id" === $"s.user_id" && $"s.ts" >= $"p.ts", "left")
      .groupBy($"p.event_id")
      .agg(min_by(struct($"s.ts", $"s.sval"), $"s.ts").as("m"))
      .select($"event_id", $"m.sval".as("asof_sval"))
    val a = viaExec.select("event_id", "asof_sval").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val b = brute.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(a.size == 400 && a == b)
  }

  test("tolerance bounds the match distance in both directions") {
    val probes = Seq(
      (1L, ts(100), "u1", 0.0),  // backward: state(90) within 20s → match
      (2L, ts(200), "u1", 0.0)   // backward: state(90) is 110s stale → null
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(("u1", ts(90), 9.0)).toDF("user_id", "ts", "sval")

    val back = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
        Seq("sval"), tolerance = Some(20L * 1000000L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(back(1L).contains(9.0))
    assert(back(2L).isEmpty)

    val fwdProbes = Seq(
      (1L, ts(80), "u1", 0.0),   // forward: state(90) within 20s → match
      (2L, ts(10), "u1", 0.0)    // forward: state(90) is 80s ahead → null
    ).toDF("event_id", "ts", "user_id", "value")
    val fwd = AsOfJoin.asOfExec(fwdProbes, states, Seq("user_id"), "ts",
        Seq("sval"), forward = true, tolerance = Some(20L * 1000000L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(fwd(1L).contains(9.0))
    assert(fwd(2L).isEmpty)
  }

  test("tolerance near Long extremes: overflowing delta is out-of-tolerance, not wrapped") {
    // LongType is a tolerable time type; a probe at Long.MaxValue against
    // state near Long.MinValue makes the raw delta wrap negative — the
    // unguarded subtraction would accept a match that is ~2^64 apart.
    val probes = Seq((1L, Long.MaxValue, "u1"))
      .toDF("event_id", "t", "user_id")
    val states = Seq(("u1", Long.MinValue + 5L, 9.0))
      .toDF("user_id", "t", "sval")
    val back = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "t",
        Seq("sval"), tolerance = Some(100L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(back(1L).isEmpty)

    // Forward mirror: probe near MinValue, state at MaxValue.
    val fwdProbes = Seq((1L, Long.MinValue + 5L, "u1"))
      .toDF("event_id", "t", "user_id")
    val fwdStates = Seq(("u1", Long.MaxValue, 9.0))
      .toDF("user_id", "t", "sval")
    val fwd = AsOfJoin.asOfExec(fwdProbes, fwdStates, Seq("user_id"), "t",
        Seq("sval"), forward = true, tolerance = Some(100L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(fwd(1L).isEmpty)

    // Sanity: in-tolerance matches at the extremes still land.
    val near = Seq(("u1", Long.MaxValue - 50L, 7.0)).toDF("user_id", "t", "sval")
    val ok = AsOfJoin.asOfExec(probes, near, Seq("user_id"), "t",
        Seq("sval"), tolerance = Some(100L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(ok(1L).contains(7.0))
  }

  test("asof_join SQL table function ≡ the DataFrame asOfExec path") {
    val probes = Seq(
      (1L, ts(50), "u1", 0.5), (2L, ts(100), "u1", 0.6),
      (3L, ts(150), "u2", 0.7)
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(
      ("u1", ts(40), 1.0), ("u1", ts(100), 2.0), ("u2", ts(200), 3.0)
    ).toDF("user_id", "ts", "sval")
    probes.createOrReplaceTempView("aspec_probes")
    states.createOrReplaceTempView("aspec_states")
    graft.plans.AsOfSqlFunction.register(spark)

    val viaSql = spark.sql(
      """SELECT event_id, asof_sval FROM
        |asof_join('aspec_probes', 'aspec_states', 'user_id', 'ts', 'sval')""".stripMargin)
    val viaDf = AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .select(col("event_id"), col("asof_sval"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(viaSql) == m(viaDf))
    assert(m(viaSql) == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
    // and it is genuinely the custom operator underneath
    viaSql.collect()
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // inner form via the 6th argument
    val inner = spark.sql(
      """SELECT event_id FROM
        |asof_join('aspec_probes', 'aspec_states', 'user_id', 'ts', 'sval', true)""".stripMargin)
    assert(inner.as[Long].collect().toSet == Set(1L, 2L))
  }

  test("asof_join SQL arguments are validated loudly") {
    graft.plans.AsOfSqlFunction.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('a', 'b', 'k')").collect()
    }
    assert(e1.getMessage.contains("5 or 6 arguments"))
    Seq((1L, ts(1), 1.0)).toDF("id", "ts", "v")
      .createOrReplaceTempView("aspec_one")
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM asof_join('aspec_one', 'aspec_one', 'id', 'ts', 'v', 7)")
        .collect()
    }
    assert(e2.getMessage.contains("BOOLEAN literal"))
  }

  test("asOfNearest picks the closer side, ties backward, one-sided and no-state rows") {
    // key 1: probe@100 between states@90 (d=10) and @105 (d=5) -> fwd;
    //        probe@95 equidistant (5 vs 10)? states 90,105: d=5 back,
    //        10 fwd -> back; probe@80 before all states -> fwd only
    // key 2: probe@50 after its only state@40 -> back only
    // key 3: no states -> nulls
    val probes = Seq((1L, ts(100), 1L), (2L, ts(95), 1L), (3L, ts(80), 1L),
      (4L, ts(50), 2L), (5L, ts(10), 3L))
      .toDF("event_id", "ts", "user_id")
    val states = Seq((1L, ts(90), 9.0), (1L, ts(105), 5.0), (2L, ts(40), 4.0))
      .toDF("user_id", "ts", "sval")
    val out = AsOfJoin.asOfNearest(probes, states, Seq("user_id"), "ts",
        Seq("sval"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Double]("asof_sval")).map(_.toDouble),
          Option(r.getAs[java.lang.Long]("asof_delta_us")).map(_.toLong)))
      .toMap
    assert(out(1L) == (Some(5.0), Some(5000000L)), s"got ${out(1L)}") // fwd closer
    assert(out(2L) == (Some(9.0), Some(5000000L))) // back closer
    assert(out(3L) == (Some(9.0), Some(10000000L))) // fwd-only side... back absent
    assert(out(4L) == (Some(4.0), Some(10000000L))) // back only
    assert(out(5L) == (None, None)) // no states for the key
  }

  test("asOfNearest exact tie resolves backward (pandas rule)") {
    val probes = Seq((1L, ts(100), 1L)).toDF("event_id", "ts", "user_id")
    val states = Seq((1L, ts(95), 1.0), (1L, ts(105), 2.0))
      .toDF("user_id", "ts", "sval")
    val r = AsOfJoin.asOfNearest(probes, states, Seq("user_id"), "ts",
      Seq("sval")).collect().head
    assert(r.getAs[Double]("asof_sval") == 1.0)
    assert(r.getAs[Long]("asof_delta_us") == 5000000L)
  }

  test("mismatched key types fail loudly at build time") {
    val probes = Seq((1L, ts(1), 7, 0.0)).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(("7", ts(1), 1.0)).toDF("user_id", "ts", "sval")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts", Seq("sval"))
    }
    assert(e.getMessage.contains("key types differ"))
  }
}
