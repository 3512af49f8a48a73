package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In,
  IsNotNull, LessThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** The metricgen DataSource V2: value parity with the declarative twin,
  * and the four source-planning behaviors (ts-filter pushdown to exact
  * id bounds, column pruning, limit pushdown, post-pruning statistics)
  * asserted at BOTH the API level (ScanBuilder in hand) and the
  * end-to-end plan level (the executed plan carries the pruned bounds).
  */
class MetricGenSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, servers: Long): DataFrame =
    spark.read.format("metricgen")
      .option("rows", rows).option("servers", servers).load()

  /** The same generation, declared over range() — also the shape of
    * q_gen_scan's DuckDB oracle.
    */
  private def twin(rows: Long, servers: Long): DataFrame =
    spark.range(rows).select(
      expr(s"timestamp_seconds(id div $servers * 5)").as("ts"),
      concat(lit("server_"), col("id") % servers + 1).as("server_id"),
      (col("id") * 37 % 10000 / 100.0).as("cpu_pct"),
      (col("id") * 53 % 10000 / 100.0).as("mem_pct"),
      (col("id") * 71 % 2000000 / 100.0).as("net_in"),
      (col("id") * 13 % 2000000 / 100.0).as("net_out"),
      (col("id") * 29 % 1000000 / 100.0).as("disk_io"))

  /** Epoch-based Timestamp: immune to the JVM default timezone
    * (Timestamp.valueOf parses in JVM-default tz while the session is
    * pinned UTC — a non-UTC machine would shift every literal).
    */
  private def tsAt(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  private def builder(rows: Long, servers: Long) =
    new MetricGenScanBuilder(new CaseInsensitiveStringMap(
      Map("rows" -> rows.toString, "servers" -> servers.toString).asJava))

  private def plannedIds(b: MetricGenScanBuilder): Seq[(Long, Long)] =
    b.build().toBatch.planInputPartitions().toSeq
      .map { case MetricGenPartition(s, e) => (s, e) }

  test("generated rows equal the declarative twin, shortName resolves") {
    val got = gen(2000, 7)
    assert(got.schema == MetricGen.schema)
    assert(got.exceptAll(twin(2000, 7)).isEmpty &&
      twin(2000, 7).exceptAll(got).isEmpty)
  }

  test("ts range filters prune the planned id range exactly (API + plan + values)") {
    // 60000 rows, 20 servers: ts >= 02:00:00 ⇔ id >= 1440·20 = 28800
    val b = builder(60000, 20)
    val residual = b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("ts", tsAt(7200)),
      LessThan("ts", tsAt(10800)),
      IsNotNull("ts")))
    assert(residual.toSeq == Seq(IsNotNull("ts"))) // not a range: stays residual
    assert(b.pushedFilters().length == 2)
    val parts = plannedIds(b)
    assert(parts.head._1 == 28800 && parts.last._2 == 43200, parts)
    assert(parts.map(p => p._2 - p._1).sum == 14400)

    // end-to-end: the executed plan's scan carries the pruned bounds
    val df = gen(60000, 20).filter(col("ts") >= "1970-01-01 02:00:00" &&
      col("ts") < "1970-01-01 03:00:00")
    df.collect() // force planning of the final plan
    assert(df.queryExecution.executedPlan.toString.contains("ids 28800..43200"),
      df.queryExecution.executedPlan.toString.take(500))
    // and the values equal the twin under the same (unpruned) filter
    val t = twin(60000, 20).filter(col("ts") >= "1970-01-01 02:00:00" &&
      col("ts") < "1970-01-01 03:00:00")
    assert(df.exceptAll(t).isEmpty && t.exceptAll(df).isEmpty)
  }

  test("off-grid ts equality is provably empty at the source") {
    val b = builder(60000, 20)
    b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("ts", tsAt(1))))
    assert(plannedIds(b).isEmpty)
    assert(gen(60000, 20)
      .filter(col("ts") === "1970-01-01 00:00:01").count() == 0)
  }

  test("column pruning reaches the reader; limit pushdown caps the id range") {
    val b = builder(60000, 20)
    b.pruneColumns(StructType(MetricGen.schema.filter(f =>
      f.name == "server_id" || f.name == "cpu_pct")))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("server_id", "cpu_pct"))
    val reader = scan.toBatch.createReaderFactory()
      .createReader(MetricGenPartition(40, 41))
    assert(reader.next())
    val row = reader.get()
    assert(row.numFields == 2)
    assert(row.getUTF8String(0).toString == "server_1") // id 40 on 20 servers
    assert(row.getDouble(1) == (40L * 37 % 10000) / 100.0)

    val lb = builder(60000, 20)
    assert(lb.pushLimit(100))
    assert(plannedIds(lb).map(p => p._2 - p._1).sum == 100)

    // end-to-end: a 2-column aggregate reads 2-field rows
    val agg = gen(60000, 20).groupBy("server_id")
      .agg(count(lit(1)).as("n")).orderBy("server_id")
    agg.collect()
    assert(agg.queryExecution.executedPlan.toString.contains("ids 0..60000"))
    assert(agg.queryExecution.executedPlan.toString.contains("metricgen[ids"))
  }

  test("property: pushed ts bounds equal the brute-force row-id model") {
    // independent model: evaluate the predicate per id over ts(id);
    // the builder's algebra (ceil/floor div on the 5s grid) must plan
    // exactly that id set, for every operator, at random geometries
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cases = Gen.listOfN(120, Gen.zip(
        Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 50L),
        Gen.chooseNum(0L, 1500L), Gen.oneOf(0, 1, 2, 3, 4)))
      .apply(Gen.Parameters.default, Seed(7L)).get
    cases.foreach { case (rows, servers, boundSec, op) =>
      val boundUs = boundSec * 1000000
      val b = builder(rows, servers)
      val filter: org.apache.spark.sql.sources.Filter = op match {
        case 0 => GreaterThanOrEqual("ts", new java.sql.Timestamp(boundSec * 1000))
        case 1 => org.apache.spark.sql.sources.GreaterThan("ts", new java.sql.Timestamp(boundSec * 1000))
        case 2 => LessThan("ts", new java.sql.Timestamp(boundSec * 1000))
        case 3 => org.apache.spark.sql.sources.LessThanOrEqual("ts", new java.sql.Timestamp(boundSec * 1000))
        case 4 => EqualTo("ts", new java.sql.Timestamp(boundSec * 1000))
      }
      assert(b.pushFilters(Array(filter)).isEmpty)
      val planned = plannedIds(b).map(p => p._2 - p._1).sum
      val model = (0L until rows).count { id =>
        val t = MetricGen.tsUs(id, servers)
        op match {
          case 0 => t >= boundUs
          case 1 => t > boundUs
          case 2 => t < boundUs
          case 3 => t <= boundUs
          case 4 => t == boundUs
        }
      }
      assert(planned == model,
        s"rows=$rows servers=$servers bound=${boundSec}s op=$op: planned $planned model $model")

      // In is PARTIAL pushdown: the clamp must be a SUPERSET of the
      // exact rows (never loses a match) and the filter must stay in
      // the residual (never claims exactness)
      val b2 = builder(rows, servers)
      val inF: org.apache.spark.sql.sources.Filter = In("ts", Array[Any](
        new java.sql.Timestamp(boundSec * 1000),
        new java.sql.Timestamp((boundSec / 2) * 1000)))
      assert(b2.pushFilters(Array(inF)).toSeq == Seq(inF))
      val ranges = plannedIds(b2)
      val lost = (0L until rows).filter { id =>
        val t = MetricGen.tsUs(id, servers)
        (t == boundUs || t == (boundSec / 2) * 1000000) &&
          !ranges.exists(r => id >= r._1 && id < r._2)
      }
      assert(lost.isEmpty, // superset must contain EVERY matching id
        s"rows=$rows servers=$servers In clamp lost ids $lost of ranges $ranges")
    }
  }

  test("streaming facet: micro-batched generation equals the batch relation, then quiesces") {
    val q = spark.readStream.format("metricgen")
      .option("rows", 5000).option("servers", 20)
      .option("rowsPerBatch", 1000).load()
      .writeStream.format("memory").queryName("gen_stream")
      .outputMode("append").start()
    q.processAllAvailable() // finite stream: offsets stop at rows
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val got = spark.table("gen_stream")
    assert(got.count() == 5000)
    assert(batches == 5, s"expected 5 batches of 1000, saw $batches")
    assert(got.exceptAll(twin(5000, 20)).isEmpty &&
      twin(5000, 20).exceptAll(got).isEmpty)
  }

  test("streaming facet: startSec prunes generation at the source; a filter alone does not") {
    // rows=5000, servers=20: ts >= 00:10:00 ⇔ id >= 120·20 = 2400.
    // Spark pushes predicates only into BATCH V2 scans, so the
    // filter-only form generates all 5000 ids and filters above the
    // source — the startSec option is the streaming-pruning contract
    // (Kafka's startingOffsets shape). Both must return the same rows;
    // only the option form may skip generation.
    def run(name: String, startSec: Option[Long]): Long = {
      val r = spark.readStream.format("metricgen")
        .option("rows", 5000).option("servers", 20)
        .option("rowsPerBatch", 1000)
      val df = startSec.fold(r.load().filter(col("ts") >= "1970-01-01 00:10:00"))(
        s => r.option("startSec", s).load())
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable()
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      assert(spark.table(name).count() == 2600, name)
      inputRows
    }
    assert(run("gen_stream_filtered", None) == 5000) // filter above source
    assert(run("gen_stream_pruned", Some(600)) == 2600) // pruned at source
  }

  test("SQL DDL surface: CREATE TABLE USING metricgen serves plain SQL") {
    spark.sql("DROP TABLE IF EXISTS gen_sql")
    spark.sql(
      "CREATE TABLE gen_sql USING metricgen OPTIONS (rows 2000, servers 20)")
    try {
      val got = spark.sql(
        """SELECT server_id, count(*) AS n,
          |  sum(cast(round(cpu_pct * 100) AS BIGINT)) AS cpu_centi
          |FROM gen_sql WHERE ts >= TIMESTAMP '1970-01-01 00:05:00'
          |GROUP BY server_id""".stripMargin)
      val want = twin(2000, 20)
        .filter(col("ts") >= "1970-01-01 00:05:00")
        .groupBy("server_id")
        .agg(count(lit(1)).as("n"),
          sum(round(col("cpu_pct") * 100).cast("long")).as("cpu_centi"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS gen_sql")
  }

  test("compile-time In(ts) is only PARTIALLY pushed: clamp prunes, residual keeps semantics") {
    // the clamp is a [min,max] superset — if pushFilters claimed it
    // fully handled, every row in the span would leak through (found
    // by review; this pins the fix). 2 grid instants × 20 servers:
    val df = gen(60000, 20).filter(col("ts").isin(tsAt(0), tsAt(3600)))
    assert(df.count() == 40)
    df.collect()
    // and the scan still pruned to the IN-set's grid span (not 0..60000)
    assert(df.queryExecution.executedPlan.toString.contains("ids 0..14420"),
      df.queryExecution.executedPlan.toString.take(400))
  }

  test("runtime filtering: an In(ts) filter prunes partitions at execution time") {
    // API level: the scan advertises ts and clamps to the IN-set's range
    val b = builder(60000, 20)
    val scan = b.build().asInstanceOf[MetricGenScan]
    assert(scan.filterAttributes().map(_.toString).toSeq == Seq("ts"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("ts", Array[Any](tsAt(7200), tsAt(9000)))))
    val parts = scan.toBatch.planInputPartitions().toSeq
      .map { case MetricGenPartition(s, e) => (s, e) }
    // min 7200s → id 28800; max 9000s grid slot ends at id (1800+1)·20
    assert(parts.head._1 == 28800 && parts.last._2 == 36020, parts)
    assert(scan.estimateStatistics().numRows().getAsLong == 36020 - 28800)

    // end to end: joining against a filtered 4-row dim triggers the
    // DPP-style runtime filter (the plan carries dynamicpruning on the
    // scan) and the values equal the twin join
    val dim = spark.range(40).select(
      expr("timestamp_seconds(id * 900)").as("ts"), (col("id") % 10).as("grp"))
    val fact = gen(60000, 20)
    val joined = fact.join(dim.filter(col("grp") === 2), Seq("ts"))
      .groupBy("server_id").agg(count(lit(1)).as("n"),
        sum(round(col("cpu_pct") * 100).cast("long")).as("cpu_centi"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(800))
    val twinJoined = twin(60000, 20).join(dim.filter(col("grp") === 2), Seq("ts"))
      .groupBy("server_id").agg(count(lit(1)).as("n"),
        sum(round(col("cpu_pct") * 100).cast("long")).as("cpu_centi"))
    assert(joined.exceptAll(twinJoined).isEmpty &&
      twinJoined.exceptAll(joined).isEmpty)
  }

  test("streaming restart resumes from the committed offset, exactly once") {
    // exercises the offset round-trip no single run touches:
    // deserializeOffset on recovery + commit() + the file sink's
    // metadata log. Run 1 is DETERMINISTICALLY partial — endSec caps
    // its offset range at the half-way grid slot (the Kafka
    // endingOffsets shape), so it quiesces mid-corpus with no poll
    // race; run 2 reopens WITHOUT the cap on the same checkpoint and
    // must continue from the committed id, not restart or overlap.
    val dir = java.nio.file.Files.createTempDirectory("gen-resume").toString
    def start(endSec: Option[Long]) = {
      val r = spark.readStream.format("metricgen")
        .option("rows", 20000).option("servers", 20)
        .option("rowsPerBatch", 500)
      endSec.foreach(e => r.option("endSec", e))
      r.load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    }
    // 20000 rows / 20 servers = grid slots 0..999; cap at slot 500
    val q1 = start(Some(2500)) // 2500s / 5s = slot 500 ⇒ ids < 10000
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 10000)
    val q2 = start(None) // same checkpoint: resumes via deserializeOffset
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 20000) // no gaps, no duplicates
    assert(out.exceptAll(twin(20000, 20)).isEmpty &&
      twin(20000, 20).exceptAll(out).isEmpty)
  }

  test("aggregate pushdown: COUNT/MIN(ts)/MAX(ts) answer closed-form, zero rows generated") {
    // plain count: closed form over the id range
    val cnt = gen(60000, 20).groupBy().count()
    assert(cnt.head().getLong(0) == 60000)
    assert(cnt.queryExecution.executedPlan.toString.contains("agg-pushed"),
      cnt.queryExecution.executedPlan.toString.take(400))

    // min/max ts compose with the FILTER clamp: still closed form
    val mm = gen(60000, 20).filter(col("ts") >= "1970-01-01 02:00:00")
      .agg(count(lit(1)).as("n"),
        expr("unix_micros(min(ts))").as("lo"),
        expr("unix_micros(max(ts))").as("hi"))
    val r = mm.head()
    assert(r.getLong(0) == 31200)
    assert(r.getLong(1) == 7200L * 1000000)   // 02:00:00 UTC
    assert(r.getLong(2) == 14995L * 1000000)  // 04:09:55 UTC
    assert(mm.queryExecution.executedPlan.toString.contains("agg-pushed"))

    // the safety claim the pushdown rests on, PINNED: an aggregate
    // above the partially-pushed In residual must NOT push (a pushed
    // COUNT would silently return the clamp-superset count). Verified
    // against Spark 4.1.2 (V2ScanRelationPushDown requires zero
    // residual filters); this assertion catches any future engine or
    // pushFilters change that breaks the invariant.
    val inCnt = gen(60000, 20).filter(col("ts").isin(tsAt(0), tsAt(3600)))
      .groupBy().count()
    assert(inCnt.head().getLong(0) == 40) // exact, not the 14420 superset
    assert(!inCnt.queryExecution.executedPlan.toString.contains("agg-pushed"))

    // empty range: global-agg-over-empty semantics (0, null, null)
    val empty = gen(60000, 20).filter(col("ts") >= "1970-01-02 00:00:00")
      .agg(count(lit(1)).as("n"), min("ts").as("lo"))
    val er = empty.head()
    assert(er.getLong(0) == 0 && er.isNullAt(1))

    // non-pushable shapes fall back to the generating scan, still exact
    val sumDf = gen(2000, 20).agg(
      sum(round(col("cpu_pct") * 100).cast("long")).as("s"))
    assert(!sumDf.queryExecution.executedPlan.toString.contains("agg-pushed"))
    val twinSum = twin(2000, 20).agg(
      sum(round(col("cpu_pct") * 100).cast("long")).as("s"))
    assert(sumDf.head().getLong(0) == twinSum.head().getLong(0))
    val grouped = gen(2000, 20).groupBy("server_id").count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("agg-pushed"))
    assert(grouped.count() == 20)
  }

  test("statistics report the POST-pruning row count and closed-form column stats") {
    val b = builder(60000, 20)
    b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("ts", tsAt(7200))))
    val stats = b.build().asInstanceOf[MetricGenScan].estimateStatistics()
    assert(stats.numRows().getAsLong == 60000 - 28800)
    assert(stats.sizeInBytes().getAsLong > 0)
    // column stats: ts ndv = grid slots 1440..2999 (1560 of them) with
    // exact micros bounds; server_id ndv = full fleet (span ≥ servers)
    val cs = stats.columnStats()
    val tsStats = cs.get(org.apache.spark.sql.connector.expressions
      .Expressions.column("ts"))
    assert(tsStats.distinctCount().getAsLong == 1560)
    assert(tsStats.min().get() == 7200L * 1000000)
    assert(tsStats.max().get() == 14995L * 1000000)
    val sidStats = cs.get(org.apache.spark.sql.connector.expressions
      .Expressions.column("server_id"))
    assert(sidStats.distinctCount().getAsLong == 20)
  }
}
