package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Profiling, RangeJoin}

/** Dataset-profiling and interval-analytics extensions: one-pass table
  * profile, exact integer-arithmetic outlier flagging, and a binned
  * interval-overlap join (sessions × incident windows). All
  * DuckDB-oracle-checked.
  */
object ProfilingQueries {

  private val profileCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
      "l_linestatus", "ship_s")

  /** 2h session gap, µs. Matches q_session_windows: a gap strictly
    * greater than this starts a new session.
    */
  private val gapUs = 7200000000L
  private val dayUs = 86400000000L

  val queries: Map[String, Q] = Map(
    // Corpus concentration: per-source token share in basis points,
    // the Herfindahl–Hirschman index over those shares (Σ share² —
    // bp², exact integers), and the dominant source's share — the
    // diversity dashboard a mixture designer reads next to
    // q_mix_budget. One |rows|-sized aggregate; everything after runs
    // on |sources| rows.
    "q_concentration" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source")).agg(sum(col("n_chars")).as("toks"))
      val tot = per.agg(sum(col("toks")).as("T"))
      per.crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("toks * 10000 div T"))
        .agg(count(lit(1)).as("n_sources"),
          sum(expr("share_bp * share_bp")).as("hhi_bp2"),
          max(col("share_bp")).as("top_share_bp"),
          sum(col("toks")).as("total_toks"))
    }),

    // k-anonymity audit over the (lang, source, 100-char size band)
    // quasi-identifier: combinations carried by < 5 docs are
    // re-identification risks even with the text scrubbed; one
    // aggregate + a window over the |combinations| frame.
    "q_k_anonymity" -> ((s, d) =>
      Profiling.kAnonymity(
        Tables.documents(s, d),
        Seq("lang" -> col("lang"), "source" -> col("source"),
          "len_band" -> expr("n_chars div 100")),
        k = 5)),

    // Right-to-be-forgotten erasure cascade: one tombstone set
    // (doc_id % 101 == 0) anti-joined through BOTH id-carrying tables
    // (documents + their embeddings) with per-table accounting — the
    // audit that proves the deletion reached every derived surface.
    "q_erasure_cascade" -> ((s, d) => {
      val tomb = Tables.documents(s, d)
        .filter(expr("doc_id % 101 = 0")).select(col("doc_id"))
      graft.operators.Privacy.erasureCascade(
        Seq(("documents", Tables.documents(s, d), "doc_id"),
          ("embeddings", Tables.embeddings(s, d), "vec_id")),
        tomb, "doc_id")
    }),

    // DP release of per-(lang, source) corpus counts — integer-exact
    // binomial noise seeded per group (see operators.Privacy), so the
    // published values reproduce bit-for-bit on any engine and across
    // release re-runs.
    "q_dp_counts" -> ((s, d) =>
      graft.operators.Privacy.dpCounts(Tables.documents(s, d),
        Seq("lang", "source"), salt = "epoch1")),

    // DP release of per-event-type clipped value sums: contributions
    // micro-quantized (×100) and clamped to [0, 10000] (sensitivity =
    // the clip width), noise scaled accordingly.
    "q_dp_sum" -> ((s, d) =>
      graft.operators.Privacy.dpSumQuantized(Tables.events(s, d),
        Seq("event_type"), "value", clipLo = 0L, clipHi = 10000L,
        scale = 100L, salt = "epoch1")),

    // Per-column profile of lineitem (keys, flags, ship date as epoch
    // seconds — doubles excluded: their string rendering is not
    // engine-portable).
    "q_profile" -> ((s, d) =>
      Profiling.tableProfile(
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast("timestamp_ltz").cast("long").as("ship_s")),
        profileCols)),

    // Rows beyond 3σ of their event_type's mean value — the z-score
    // decided in exact DECIMAL(38,0) arithmetic, so the flag set is
    // bit-identical to the HUGEINT oracle.
    "q_outliers" -> ((s, d) =>
      Profiling.zScoreOutliers(
        Tables.events(s, d).select(
          col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("qv")),
        groupCol = "event_type", quantCol = "qv", k = 3)),

    // ROBUST outlier screen: median / MAD instead of mean / σ — the
    // q_outliers variant that a heavy-tailed metric needs (3σ under a
    // few huge spikes inflates σ until nothing flags; the median
    // absolute deviation is breakdown-point-0.5 robust). Both medians
    // are RANK-SELECTED stored values via the shared rankOrdered
    // scaffold (no interpolation — the 1-ulp cross-engine hazard), and
    // every comparison is a single IEEE op on stored doubles
    // (subtract/abs/multiply-by-3), so the flag set is engine-exact
    // with no quantization needed. Two rank windows + two broadcast
    // joins of the 5-row med/mad tables; shuffles ∝ |events| twice.
    "q_mad_outliers" -> ((s, d) => {
      // base feeds the median window AND dev; dev feeds the MAD window
      // AND the final aggregate — nothing guarantees exchange reuse
      // across those subtrees, so both are scope-persisted (the
      // prefixJaccardJoin / globalNtile lesson) and released after the
      // first consuming action.
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .persist()
      val med = rankOrdered(base, "event_type", "value", "event_id")
        .filter(col("rn") === rankIdx(50))
        .select(col("event_type"), col("value").as("med"))
      val dev = base.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
        .persist()
      val mad = rankOrdered(
          dev.select(col("event_type"), col("event_id"), col("adev")),
          "event_type", "adev", "event_id")
        .filter(col("rn") === rankIdx(50))
        .select(col("event_type"), col("adev").as("mad"))
      graft.core.CacheScope.releaseAfterUse(
        dev.join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L))
              .as("n_outliers"),
            max(col("med")).as("med"), max(col("mad")).as("mad")),
        base, dev)
    }),

    // Interval-overlap join: user sessions (2h gap) × daily error
    // incident windows, then a per-day rollup. The overlap join is the
    // binned equi-join — no BroadcastNestedLoopJoin.
    "q_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("e_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("e_us"))
      val sessions = ev
        .withColumn("new_s",
          when(col("e_us") - lag(col("e_us"), 1).over(w) > gapUs, 1L)
            .otherwise(when(lag(col("e_us"), 1).over(w).isNull, 1L).otherwise(0L)))
        .withColumn("sid", sum(col("new_s")).over(w))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("e_us")).as("s_start"), (max(col("e_us")) + 1).as("s_end"))
      val incidents = ev.filter(col("event_type") === "error")
        .withColumn("day", expr(s"e_us div $dayUs"))
        .groupBy(col("day"))
        .agg(min(col("e_us")).as("i_start"), (max(col("e_us")) + 1).as("i_end"))
      RangeJoin.intervalOverlap(sessions, incidents,
        "s_start", "s_end", "i_start", "i_end", binWidth = dayUs)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"),
          sum(least(col("s_end"), col("i_end")) -
            greatest(col("s_start"), col("i_start"))).as("total_overlap_us"))
    }),

    // Watermarked interval (band) join, batch twin: each error event
    // paired with the same user's purchases within ±10 minutes — the
    // "what did this failure interrupt?" correlation. Runs the EXACT
    // code path the streaming topology uses (StreamingPipeline
    // .intervalJoin; withWatermark is a no-op in batch), so this oracle
    // gates the stream-stream plan's join semantics too. Lag stays in
    // exact microseconds — no seconds division to disagree over.
    // Plan: equi-join on user_id with the band as a post-join filter —
    // at 100 TB a keyed shuffle join, pairs bounded by events within
    // ±tolerance per user, never |errors|×|purchases|.
    "q_band_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pur_ts"), col("event_id").as("pur_id"))
      graft.streaming.StreamingPipeline
        .intervalJoin(err, "err_ts", pur, "pur_ts", "user_id", "10 minutes")
        .select(col("user_id"), col("err_id"), col("pur_id"),
          (expr("unix_micros(pur_ts)") - expr("unix_micros(err_ts)")).as("lag_us"))
    }),

    // Data-quality expectations gate (the pre-training contract check):
    // hard invariants (range, FK, uniqueness, derived-column
    // consistency) plus curation expectations that genuinely trip on
    // this data — one (constraint, n_checked, n_violations) row each.
    // Each check is a narrow aggregate over a pruned scan (the FK check
    // is an exists-count via left join against the distinct key set —
    // at scale a shuffled hash join on the key, never a collect);
    // violating ROWS are a filter away, the gate stays O(constraints).
    "q_expectations" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val ev = Tables.events(s, d)
      val docs = Tables.documents(s, d)
      def gate(name: String, checked: org.apache.spark.sql.DataFrame) =
        checked.select(lit(name).as("constraint"),
          count(lit(1)).as("n_checked"),
          count(when(col("viol"), 1)).as("n_violations"))
      val range = gate("lineitem.quantity_in_1_50",
        li.select((col("l_quantity") < 1 || col("l_quantity") > 50).as("viol")))
      val fk = gate("lineitem.orderkey_fk",
        li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")).distinct(),
            col("l_orderkey") === col("o_orderkey"), "left")
          .select(col("o_orderkey").isNull.as("viol")))
      val uniq = gate("orders.orderkey_unique",
        ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .select((col("c") > 1).as("viol")))
      val cons = gate("documents.n_chars_consistent",
        docs.select((col("n_chars") =!= length(col("text"))).as("viol")))
      val biz = gate("events.value_le_400",
        ev.select((col("value") > 400).as("viol")))
      val minLen = gate("documents.min_200_chars",
        docs.select((col("n_chars") < 200).as("viol")))
      range.union(fk).union(uniq).union(cons).union(biz).union(minLen)
    }),

    // Distribution drift between two corpus snapshots (stand-in: the
    // even/odd doc_id halves) — per-language fraction-free histogram-L1
    // in ppm over 200-char-wide length bins. The inter-ingest monitor
    // that catches "the new crawl's documents are suddenly shorter"
    // before training does.
    "q_drift" -> ((s, d) =>
      Profiling.histogramDrift(Tables.documents(s, d),
        groupCol = "lang", sideACond = pmod(col("doc_id"), lit(2)) === 0,
        valueCol = "n_chars", binWidth = 200L, maxBin = 9)),

    // Exact two-sample Kolmogorov–Smirnov distance per language between
    // the same even/odd doc_id halves q_drift compares — the bin-free
    // sup-norm complement to its binned histogram-L1 (KS sees a shift
    // that lands inside one 200-char bin; L1 sees mass reshuffles KS's
    // single sup point misses). D = max|F̂_a − F̂_b| over the pooled
    // support, fraction-free: per distinct length the cross-multiplied
    // gap |ca·nb − cb·na| is an exact integer and the ppm division
    // happens once per language at the end.
    //
    // Scale: the per-(lang, length) count aggregate compresses |docs|
    // rows to |langs × distinct lengths| BEFORE the ECDF window, so the
    // window sorts thousands of rows, never the corpus; the cross-
    // multiplied gap stays in int64 while docs-per-lang < 3e9 (past
    // that, lift the two products to DECIMAL(38,0) — same shape).
    "q_ks_drift" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("lang"), col("n_chars").as("v"),
          pmod(col("doc_id"), lit(2)).as("side"))
        .groupBy(col("lang"), col("v"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
      val ord = Window.partitionBy(col("lang")).orderBy(col("v"))
      val all = Window.partitionBy(col("lang"))
      cnt
        .withColumn("ca", sum(col("a")).over(ord))
        .withColumn("cb", sum(col("b")).over(ord))
        .withColumn("na", sum(col("a")).over(all))
        .withColumn("nb", sum(col("b")).over(all))
        .groupBy(col("lang"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("d_num"))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        // the ppm lift rides decimal: d_num ≤ n_a·n_b, so a LONG
        // d_num·10⁶ would wrap at ~3e6 docs per side — 1000× below the
        // cross-multiply's own 3e9 bound documented above
        .select(col("lang"), col("n_a"), col("n_b"),
          expr("(cast(d_num as decimal(38,0)) * 1000000) div (n_a * n_b)")
            .as("ks_ppm"))
    }),

    // Benford leading-digit audit over price cents: observed share per
    // first digit (milli-units, fraction-free) against the public
    // Benford constants ⌊1000·log10(1+1/d)⌋ — the classic naturalness
    // check on numeric columns (synthetic or tampered value streams,
    // like this fixture's uniform prices, light up with large
    // deviations; organically-grown magnitudes track the curve).
    // Leading digit extracted from the INTEGER's decimal string — both
    // engines print int64 identically, unlike double formatting. One
    // |rows|→9-row aggregate; everything after runs on 9 rows.
    "q_benford" -> ((s, d) => {
      val digits = Tables.lineitem(s, d)
        .filter(col("l_extendedprice") > 0)
        .select(substring(floor(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val expected = benfordMilli.tail.foldLeft(
        when(col("digit") === benfordMilli.head._1, benfordMilli.head._2)) {
        case (acc, (dig, m)) => acc.when(col("digit") === dig, m)
      }.otherwise(0L)
      // total as a window over the ALREADY-AGGREGATED 9-row frame — a
      // separate `digits.agg(sum)` subtree would re-scan lineitem and
      // re-run the digit aggregate (no exchange reuse across
      // differently-shaped plans); the serial window is over ≤ 9 rows
      digits
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .withColumn("share_milli", expr("n * 1000 div total"))
        .withColumn("expected_milli", expected)
        .select(col("digit"), col("n"), col("share_milli"),
          col("expected_milli"),
          abs(col("share_milli") - col("expected_milli")).as("dev_milli"))
    }),

    // Per-dimension embedding health: exact micro-unit mean, variance
    // and range for every dimension, plus a dead-dim flag (min == max —
    // a collapsed dimension wastes index width and, for cosine search,
    // adds a constant that distorts every similarity). Values are
    // quantized once (floor(x·10⁶), the same IEEE double multiply in
    // both engines) and SHIFTED +10⁶ so every sum is nonnegative —
    // integer `div` truncates toward zero while DuckDB's `//` floors,
    // so negative numerators are the one cross-engine hazard; the shift
    // removes it (mean unshifts at the end, variance is shift-
    // invariant). Σp² rides DECIMAL(38,0) (HUGEINT mirror): at 1e11
    // vectors a dimension's squared micro-unit sum is ~1e23, past
    // int64.
    //
    // Scale: posexplode fans |vectors| rows to |vectors|·dims, but the
    // aggregate is keyed by dim — partial (map-side) aggregation
    // collapses each task's fan-out to ≤ dims rows before the shuffle,
    // so the exchange carries |tasks|·dims rows regardless of corpus
    // size.
    "q_dim_stats" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "e")))
        .select(col("dim").cast("long").as("dim"),
          (floor(col("e").cast("double") * 1000000).cast("long") +
            1000000L).as("p"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
          min(col("p")).as("mn"), max(col("p")).as("mx"),
          sum(col("p").cast("decimal(38,0)") * col("p")).as("ss"))
        .select(col("dim"), col("n"),
          (expr("sp div n") - 1000000L).as("mean_u"),
          (col("mn") - 1000000L).as("min_u"),
          (col("mx") - 1000000L).as("max_u"),
          expr("(n * ss - cast(sp as decimal(38,0)) * sp) div (n * n)")
            .as("var_u2"),
          (col("mn") === col("mx")).as("is_dead")))
  )

  /** ⌊1000·log10(1+1/d)⌋ for d = 1..9 — the Benford first-digit law
    * in integer milli-units (public constants; floors sum to 995).
    */
  private val benfordMilli: Seq[(Long, Long)] =
    Seq(1L -> 301L, 2L -> 176L, 3L -> 124L, 4L -> 96L, 5L -> 79L,
      6L -> 66L, 7L -> 57L, 8L -> 51L, 9L -> 45L)

  private val benfordCaseSql: String =
    "CASE digit " + benfordMilli.map { case (d, m) => s"WHEN $d THEN $m" }
      .mkString(" ") + " ELSE 0 END"

  private val profileOracle = profileCols.map { c =>
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
       |FROM li""".stripMargin
  }.mkString("\nUNION ALL\n")

  val oracles: Map[String, String] = Map(

    // Mirrors Privacy.binomialNoise exactly: 15 md5 hex chars of
    // concat_ws('|', salt, keys...) parse to a 60-bit BIGINT,
    // popcount - 30. concat_ws on BOTH engines (not '||'): Spark's
    // concat_ws skips NULL group keys while '||' would NULL the whole
    // seed — the seed strings must agree byte-for-byte.
    "q_erasure_cascade" ->
      """WITH t AS (SELECT doc_id FROM documents WHERE doc_id % 101 = 0)
        |SELECT 'documents' AS table_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_erased,
        |  CAST(COUNT(*) - SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_kept
        |FROM documents d LEFT JOIN t ON d.doc_id = t.doc_id
        |UNION ALL
        |SELECT 'embeddings',
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(COUNT(*) - SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS BIGINT)
        |FROM embeddings e LEFT JOIN t ON e.vec_id = t.doc_id""".stripMargin,

    "q_dp_counts" ->
      """SELECT lang, source,
        |  CAST(COUNT(*) +
        |    bit_count(('0x' || substr(md5(concat_ws('|', 'epoch1', lang, source)), 1, 15))::BIGINT)
        |    - 30 AS BIGINT) AS noisy_count
        |FROM documents GROUP BY lang, source""".stripMargin,

    // NULL values contribute 0, not the clip ceiling (see
    // Privacy.dpSumQuantized) — the CASE guard mirrors the Spark side.
    "q_dp_sum" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 0
        |           ELSE GREATEST(0, LEAST(10000, CAST(FLOOR(value * 100) AS BIGINT))) END) +
        |    (bit_count(('0x' || substr(md5(concat_ws('|', 'epoch1', event_type)), 1, 15))::BIGINT) - 30)
        |    * 10000 AS BIGINT) AS noisy_sum_q
        |FROM events GROUP BY event_type""".stripMargin,

    "q_concentration" ->
      """WITH t AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
        |  FROM documents GROUP BY source
        |), tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS T FROM t),
        |s AS (
        |  SELECT toks, (toks * 10000) // T AS share_bp FROM t CROSS JOIN tot
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
        |  CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
        |  MAX(share_bp) AS top_share_bp,
        |  CAST(SUM(toks) AS BIGINT) AS total_toks
        |FROM s""".stripMargin,

    "q_k_anonymity" ->
      """WITH c AS (
        |  SELECT lang, source, n_chars // 100 AS len_band,
        |    CAST(COUNT(*) AS BIGINT) AS group_n
        |  FROM documents GROUP BY 1, 2, 3
        |), t AS (
        |  SELECT CAST(SUM(CASE WHEN group_n < 5 THEN group_n ELSE 0 END) AS BIGINT) AS risk_rows,
        |    CAST(SUM(group_n) AS BIGINT) AS total_rows
        |  FROM c)
        |SELECT lang, source, len_band, group_n,
        |  group_n < 5 AS at_risk,
        |  risk_rows * 10000 // total_rows AS risk_share_bp
        |FROM c CROSS JOIN t""".stripMargin,

    "q_profile" ->
      s"""WITH li AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey, l_returnflag, l_linestatus,
         |    epoch_ms(l_shipdate) // 1000 AS ship_s
         |  FROM lineitem
         |)
         |$profileOracle""".stripMargin,

    "q_mad_outliers" -> {
      val idx = sqlRankIdx(50)
      s"""WITH b AS (
         |  SELECT event_type, event_id, value FROM events
         |), r1 AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value ASC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM b
         |), med AS (
         |  SELECT event_type, value AS med FROM r1 WHERE rn = $idx
         |), dev AS (
         |  SELECT b.event_type, b.event_id, b.value, med.med,
         |    abs(b.value - med.med) AS adev
         |  FROM b JOIN med USING (event_type)
         |), r2 AS (
         |  SELECT event_type, adev,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY adev ASC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM dev
         |), mad AS (
         |  SELECT event_type, adev AS mad FROM r2 WHERE rn = $idx
         |)
         |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN d.adev > m.mad * 3 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers,
         |  MAX(d.med) AS med, MAX(m.mad) AS mad
         |FROM dev d JOIN mad m USING (event_type)
         |GROUP BY d.event_type""".stripMargin
    },

    "q_outliers" ->
      """WITH q AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS qv
        |  FROM events
        |), s AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(qv) AS HUGEINT) AS sm,
        |    SUM(CAST(qv AS HUGEINT) * qv) AS v
        |  FROM q GROUP BY event_type
        |)
        |SELECT q.event_id, q.event_type, q.qv
        |FROM q JOIN s USING (event_type)
        |WHERE (n * qv - sm) * (n * qv - sm) > 9 * (n * v - sm * sm)""".stripMargin,

    "q_band_join" ->
      """SELECT e.user_id, e.event_id AS err_id, p.event_id AS pur_id,
        |  epoch_us(p.ts) - epoch_us(e.ts) AS lag_us
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id
        | AND e.event_type = 'error' AND p.event_type = 'purchase'
        | AND p.ts >= e.ts - INTERVAL 10 MINUTE
        | AND p.ts <= e.ts + INTERVAL 10 MINUTE""".stripMargin,

    "q_interval_overlap" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS e_us FROM events
         |), g AS (
         |  SELECT user_id, e_us,
         |    CASE WHEN e_us - lag(e_us) OVER w > $gapUs
         |         OR lag(e_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY e_us)
         |), sid AS (
         |  SELECT user_id, e_us,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY e_us) AS sid
         |  FROM g
         |), sessions AS (
         |  SELECT user_id, sid, MIN(e_us) AS s_start, MAX(e_us) + 1 AS s_end
         |  FROM sid GROUP BY user_id, sid
         |), incidents AS (
         |  SELECT e_us // $dayUs AS day, MIN(e_us) AS i_start, MAX(e_us) + 1 AS i_end
         |  FROM ev WHERE event_type = 'error' GROUP BY 1
         |)
         |SELECT i.day, COUNT(*) AS n_sessions,
         |  COUNT(DISTINCT s.user_id) AS n_users,
         |  CAST(SUM(least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start))
         |    AS BIGINT) AS total_overlap_us
         |FROM sessions s JOIN incidents i
         |  ON s.s_start < i.i_end AND i.i_start < s.s_end
         |GROUP BY i.day""".stripMargin,

    "q_expectations" ->
      """SELECT 'lineitem.quantity_in_1_50' AS constraint, COUNT(*) AS n_checked,
        |  COUNT(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.orderkey_fk', COUNT(*),
        |  COUNT(*) FILTER (o_orderkey IS NULL)
        |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |  ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'orders.orderkey_unique', COUNT(*), COUNT(*) FILTER (c > 1)
        |FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey)
        |UNION ALL
        |SELECT 'documents.n_chars_consistent', COUNT(*),
        |  COUNT(*) FILTER (n_chars <> length(text))
        |FROM documents
        |UNION ALL
        |SELECT 'events.value_le_400', COUNT(*), COUNT(*) FILTER (value > 400)
        |FROM events
        |UNION ALL
        |SELECT 'documents.min_200_chars', COUNT(*),
        |  COUNT(*) FILTER (n_chars < 200)
        |FROM documents""".stripMargin,

    // Mirrors Profiling.histogramDrift: HUGEINT cross-multiplied L1,
    // integer // division, NULL when either side is empty.
    "q_drift" ->
      """WITH s AS (
        |  SELECT lang, doc_id % 2 = 0 AS is_a,
        |    least(n_chars // 200, 9) AS bin
        |  FROM documents
        |), c AS (
        |  SELECT lang, bin,
        |    CAST(COUNT(*) FILTER (is_a) AS BIGINT) AS ca,
        |    CAST(COUNT(*) FILTER (NOT is_a) AS BIGINT) AS cb
        |  FROM s GROUP BY lang, bin
        |), t AS (
        |  SELECT lang, CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b
        |  FROM c GROUP BY lang
        |), l AS (
        |  SELECT c.lang,
        |    SUM(abs(CAST(c.ca AS HUGEINT) * t.n_b - CAST(c.cb AS HUGEINT) * t.n_a))
        |      AS l1
        |  FROM c JOIN t USING (lang) GROUP BY c.lang
        |)
        |SELECT t.lang, t.n_a, t.n_b,
        |  CASE WHEN t.n_a > 0 AND t.n_b > 0
        |       THEN CAST((l.l1 * 1000000) // (CAST(t.n_a AS HUGEINT) * t.n_b)
        |                 AS BIGINT) END AS l1_ppm,
        |  CASE WHEN t.n_a > 0 AND t.n_b > 0
        |       THEN (l.l1 * 1000000) // (CAST(t.n_a AS HUGEINT) * t.n_b) >= 300000
        |       END AS drifted
        |FROM t JOIN l USING (lang)""".stripMargin,

    "q_benford" ->
      s"""WITH c AS (
         |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
         |  FROM lineitem WHERE l_extendedprice > 0
         |), d AS (
         |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM c GROUP BY 1
         |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
         |SELECT digit, n, n * 1000 // total AS share_milli,
         |  CAST($benfordCaseSql AS BIGINT) AS expected_milli,
         |  ABS(n * 1000 // total - ($benfordCaseSql)) AS dev_milli
         |FROM d CROSS JOIN t""".stripMargin,

    // Window SUM(BIGINT) is HUGEINT in DuckDB; every product is cast
    // back through BIGINT only after the final division.
    "q_ks_drift" ->
      """WITH c AS (
        |  SELECT lang, n_chars AS v,
        |    CAST(COUNT(*) FILTER (doc_id % 2 = 0) AS BIGINT) AS a,
        |    CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS b
        |  FROM documents GROUP BY 1, 2
        |), e AS (
        |  SELECT lang,
        |    SUM(a) OVER (PARTITION BY lang ORDER BY v) AS ca,
        |    SUM(b) OVER (PARTITION BY lang ORDER BY v) AS cb,
        |    SUM(a) OVER (PARTITION BY lang) AS na,
        |    SUM(b) OVER (PARTITION BY lang) AS nb
        |  FROM c
        |)
        |SELECT lang, CAST(MAX(na) AS BIGINT) AS n_a,
        |  CAST(MAX(nb) AS BIGINT) AS n_b,
        |  CAST(MAX(ABS(ca * nb - cb * na)) * 1000000
        |       // (MAX(na) * MAX(nb)) AS BIGINT) AS ks_ppm
        |FROM e GROUP BY lang
        |HAVING MAX(na) > 0 AND MAX(nb) > 0""".stripMargin,

    // List position via CROSS JOIN range(64): the fixture embeds are
    // 64-wide (DuckDB 1.0 has no UNNEST WITH ORDINALITY); DuckDB lists
    // are 1-indexed, so element i of dim d = embedding[d+1]. The +10⁶
    // shift and HUGEINT Σp² mirror the Spark side exactly.
    "q_dim_stats" ->
      """WITH x AS (
        |  SELECT t.i AS dim,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
        |               * 1000000) AS BIGINT) + 1000000 AS p
        |  FROM embeddings CROSS JOIN range(64) t(i)
        |), s AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS sp,
        |    SUM(CAST(p AS HUGEINT) * p) AS ss,
        |    CAST(MIN(p) AS BIGINT) AS mn, CAST(MAX(p) AS BIGINT) AS mx
        |  FROM x GROUP BY dim
        |)
        |SELECT dim, n, sp // n - 1000000 AS mean_u,
        |  mn - 1000000 AS min_u, mx - 1000000 AS max_u,
        |  CAST((n * ss - CAST(sp AS HUGEINT) * sp)
        |       // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_u2,
        |  mn = mx AS is_dead
        |FROM s""".stripMargin
  )
}
