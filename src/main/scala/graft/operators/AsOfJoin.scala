package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** As-of (point-in-time) join: for each probe row, the most recent
  * state row with the same key and state.ts <= probe.ts — the classic
  * "join each event to the config/metric snapshot in force at its
  * time" operator.
  *
  * Spark has no native as-of join; the preference-order-(a) composition
  * (SURVEY.md §7.3) expresses it with a union + one ordered window:
  * tag state rows 0 and probe rows 1, sort (ts, tag) within each key,
  * and carry the last non-null state payload forward. One shuffle on
  * the key — the same cost as the sort-merge join a native
  * implementation would do, with no custom plan node to maintain.
  * Ties (state.ts == probe.ts) resolve to the state row, matching
  * `probe.ts >= state.ts` semantics (and DuckDB's ASOF JOIN, which the
  * oracle uses natively).
  *
  * Scale: the window is per-key ordered — at 100 TB this is a
  * shuffle+sort on (key), with skew handled like any windowed op
  * (hot keys → AQE or pre-bucketing by key).
  */
object AsOfJoin {

  /** @param probes     left side (kept in full)
    * @param states     right side carrying `payloadCols`
    * @param keys       equi-join keys
    * @param tsCol      event-time column name present on both sides
    * @param payloadCols state columns to carry onto probes (null when
    *                    no state at or before the probe's ts)
    */
  def asOf(probes: DataFrame, states: DataFrame, keys: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    // The carried value is ONE struct per state row, not the payload
    // columns individually: the struct is never null for a state row
    // even when every payload FIELD is null, so last(ignoreNulls) means
    // "latest state row" — a genuinely-NULL payload value is carried
    // faithfully instead of being skipped for an older state's value.
    val stateStruct = struct(payloadCols.map(c => col(c).as(c)): _*)
    val stateStructType = states.select(stateStruct.as("_s")).schema("_s").dataType
    val probeCols = probes.columns
    val p = probes
      .withColumn("_tag", lit(1))
      .select(probeCols.map(col) ++ Seq(col("_tag")) ++
        Seq(lit(null).cast(stateStructType).as("_s")): _*)
    val s = states
      .select(keys.map(col) ++ Seq(col(tsCol), lit(0).as("_tag"), stateStruct.as("_s")): _*)
    // align schemas: state rows carry nulls for probe-only columns
    val probeOnly = probeCols.filterNot(c => keys.contains(c) || c == tsCol)
    val sAligned = probeOnly.foldLeft(s)((d, c) =>
      d.withColumn(c, lit(null).cast(probes.schema(c).dataType)))
      .select(p.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    p.unionByName(sAligned)
      .withColumn("_carry", last(col("_s"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col("_carry").getField(c).as(s"asof_$c")): _*)
  }

  /** The same as-of semantics through the library's custom PHYSICAL
    * operator ([[graft.plans.AsOfJoinExec]], a sorted-merge pass
    * planned from [[graft.plans.AsOfJoinPlan]] by
    * [[graft.plans.AsOfJoinStrategy]]) — preference-order (c) where
    * [[asOf]] is preference-order (a); both are cross-gated on the
    * same DuckDB `ASOF JOIN` oracle.
    *
    * Output matches [[asOf]]: all probe columns, then one
    * `asof_<payload>` column per payload. Ties on state (key, ts)
    * resolve arbitrarily (sort-order-last) — pre-aggregate states when
    * determinism matters, as the shipped queries do.
    *
    * Scale: two shuffle+sorts on (keys) — the exact cost of the
    * sort-merge equi-join Spark would plan for the same keys — then a
    * single O(|probes| + |states|) merge with one retained row of
    * state, versus the composition's window over the UNION of both
    * sides. At 100 TB the windowed form pays sort + carry over
    * |probes| + |states| rows per key; this pays the same sorts but no
    * union materialization and no window frame machinery.
    *
    * @param inner     drop unmatched probes (DuckDB `ASOF JOIN`) instead
    *                  of null-extending them (`ASOF LEFT JOIN`, default)
    * @param forward   match the NEAREST state at-or-AFTER the probe
    *                  (DuckDB `ON p.ts <= s.ts`) instead of at-or-before
    * @param tolerance max |probe − state| in the time column's native
    *                  units (micros for timestamps; pandas
    *                  merge_asof-style): nearest match farther than the
    *                  bound counts as no match
    */
  def asOfExec(probes: DataFrame, states: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               inner: Boolean = false, forward: Boolean = false,
               tolerance: Option[Long] = None): DataFrame = {
    val spark = probes.sparkSession
    PlanBridge.ensureStrategy(spark, AsOfJoinStrategy)
    // Re-alias EVERY right column: collision-free names against the
    // probe side and fresh exprIds, so probes/states may share a scan
    // (self-as-of) without ambiguous attributes in the custom node.
    val rightSel = states.select(
      keys.map(k => col(k).as(s"_rk_$k")) ++
        Seq(col(tsCol).as("_rts")) ++
        payloadCols.map(c => col(c).as(s"asof_$c")): _*)
    val lPlan = probes.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"as-of join: no column '$n'"))
    val lKeys = keys.map(attr(lPlan, _))
    val rKeys = keys.map(k => attr(rPlan, s"_rk_$k"))
    require(lKeys.map(_.dataType) == rKeys.map(_.dataType),
      s"as-of join key types differ: ${lKeys.map(_.dataType)} vs ${rKeys.map(_.dataType)}")
    val node = AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys,
      attr(lPlan, tsCol), attr(rPlan, "_rts"), isLeftOuter = !inner,
      isForward = forward, tolerance = tolerance)
    PlanBridge.ofRows(spark, node)
      .select(probes.columns.map(col) ++ payloadCols.map(c => col(s"asof_$c")): _*)
  }

  /** merge_asof `direction='nearest'`: each probe takes the state with
    * the smallest |probe.ts − state.ts| on its key, ties resolving
    * BACKWARD (the at-or-before state) — pandas' tie rule. Composed as
    * two [[asOfExec]] passes (backward then forward, the second fed
    * the first's output so no probe-identity join is needed), each
    * carrying the matched state's ts so the pick is a pure integer
    * CASE on microsecond deltas. Adds `asof_delta_us` (the winning
    * |Δ|, null when the key has no state at all) next to the
    * `asof_<payload>` columns; unmatched probes null-extend.
    *
    * Scale: exactly two sorted-merge as-of passes — 2× the cost of one
    * directional as-of, each the sort-merge-join shuffle shape; the
    * CASE pick is row-local.
    */
  def asOfNearest(probes: DataFrame, states: DataFrame, keys: Seq[String],
                  tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val reserved = Seq("_sts", "_b_ts", "_f_ts", "asof_delta_us") ++
      payloadCols.flatMap(c => Seq(s"_b_$c", s"_f_$c"))
    val clash = probes.columns.toSet intersect reserved.toSet
    require(clash.isEmpty,
      s"asOfNearest reserves column names ${clash.mkString(", ")}")
    val st = states.withColumn("_sts", col(tsCol))
    val pay = payloadCols :+ "_sts"
    val back = asOfExec(probes, st, keys, tsCol, pay)
    val bRen = payloadCols.foldLeft(
      back.withColumnRenamed("asof__sts", "_b_ts"))((d, c) =>
      d.withColumnRenamed(s"asof_$c", s"_b_$c"))
    val fwd = asOfExec(bRen, st, keys, tsCol, pay, forward = true)
    val both = payloadCols.foldLeft(
      fwd.withColumnRenamed("asof__sts", "_f_ts"))((d, c) =>
      d.withColumnRenamed(s"asof_$c", s"_f_$c"))
    val db = expr(s"unix_micros($tsCol) - unix_micros(_b_ts)")
    val df = expr(s"unix_micros(_f_ts) - unix_micros($tsCol)")
    // no forward match, or backward at-most-as-far (tie -> backward)
    val useB = col("_f_ts").isNull || (col("_b_ts").isNotNull && db <= df)
    val withPick = payloadCols.foldLeft(
      both.withColumn("asof_delta_us", when(useB, db).otherwise(df)))(
      (d, c) => d.withColumn(s"asof_$c",
        when(useB, col(s"_b_$c")).otherwise(col(s"_f_$c"))))
    withPick.drop(
      (payloadCols.map(c => s"_b_$c") ++ payloadCols.map(c => s"_f_$c") ++
        Seq("_b_ts", "_f_ts")): _*)
  }
}
