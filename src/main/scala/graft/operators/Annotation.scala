package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-aggregation for human/model-rated training data — the
  * preference-data curation step of an RLHF/classifier pipeline: many
  * raters vote a label per item; downstream training wants one row per
  * item with the consensus label and how contested it was (low
  * agreement → route to re-annotation or drop).
  *
  * All outputs are exact integers (vote counts, agreement in basis
  * points via integer division) so the result is engine-portable —
  * no floating-point consensus scores.
  *
  * Scale: one exchange on (item, label) for the vote count, then one
  * on item for the consensus pick. The per-item consensus uses the
  * bounded-heap [[graft.functions.TopKStruct]] aggregate (k=1), so the
  * second exchange carries ONE candidate row per item per map task —
  * never the full label histogram — and per-key state is O(1). A
  * million-way-contested item costs the same as a unanimous one.
  */
object Annotation {

  /** Per-item consensus: majority label (ties → lexicographically
    * smallest label, deterministic), its vote count, total votes,
    * distinct labels, and agreement = majority_n·10000 div n_votes.
    */
  def majorityVote(votes: DataFrame, itemCol: String, labelCol: String): DataFrame =
    consensusFromCounts(
      votes.groupBy(col(itemCol), col(labelCol).as("label"))
        .agg(count(lit(1)).as("cnt")),
      itemCol)

  /** The consensus pick over a pre-counted (item, label, cnt) table —
    * shared by the batch path above and the streaming twin below.
    */
  def consensusFromCounts(counts: DataFrame, itemCol: String): DataFrame =
    counts
      .groupBy(col(itemCol))
      .agg(
        graft.functions.TopKStruct.topK(
          struct(col("cnt"), col("label")), 1, true, false).as("top"),
        sum(col("cnt")).as("n_votes"),
        count(lit(1)).as("n_labels"))
      .select(col(itemCol),
        element_at(col("top"), 1).getField("label").as("majority_label"),
        element_at(col("top"), 1).getField("cnt").as("majority_n"),
        col("n_votes"), col("n_labels"))
      .withColumn("agreement_bp", expr("majority_n * 10000 div n_votes"))

  /** Cohen's κ inter-annotator agreement between two raters over
    * shared items — the annotation-campaign QA number read next to
    * [[majorityVote]]'s per-item agreement: how much better than chance
    * do the raters agree, given their individual label marginals?
    *
    *   κ = (p_o − p_e)/(1 − p_e),  p_o = A/N,  p_e = Σ_l nA_l·nB_l / N²
    *     = (A·N − P)/(N² − P)      with P = Σ_l nA_l·nB_l
    *
    * Emitted as the EXACT integer numerator/denominator pair (plus the
    * ingredients), never divided: κ is legitimately negative when
    * raters agree less than chance, and integer-division truncation
    * direction for negatives differs across engines — a ratio the
    * consumer divides is portable, a truncated quotient is not.
    *
    * `pairs` is one row per doubly-labeled item with the two label
    * columns. Scale: one pass for (N, A), one |label-vocabulary|-sized
    * aggregate per side for the marginals, every join broadcast-bounded
    * by the vocabulary — nothing is ever keyed by item.
    */
  def cohenKappa(pairs: DataFrame, labelACol: String, labelBCol: String): DataFrame = {
    val totals = pairs.agg(
      count(lit(1)).as("n_items"),
      // coalesce: SUM over ZERO pairs is NULL, but "no items, no
      // agreements" is a 0 — and the COUNT(*) FILTER oracle form says 0
      coalesce(sum(when(col(labelACol) === col(labelBCol), 1L).otherwise(0L)),
        lit(0L)).as("agree_n"))
    val aCnt = pairs.groupBy(col(labelACol).as("l")).agg(count(lit(1)).as("na"))
    val bCnt = pairs.groupBy(col(labelBCol).as("l")).agg(count(lit(1)).as("nb"))
    // inner join: a label used by only one rater contributes nA_l·0 = 0
    val pe = aCnt.join(bCnt, Seq("l"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    totals.crossJoin(broadcast(pe))
      .select(col("n_items"), col("agree_n"), col("pe_num"),
        (col("agree_n") * col("n_items") - col("pe_num")).as("kappa_num"),
        (col("n_items") * col("n_items") - col("pe_num")).as("kappa_den"))
  }

  /** Krippendorff's α (nominal metric, any number of raters, variable
    * ratings-per-item) — the agreement coefficient that generalizes
    * [[cohenKappa]] past two raters and tolerates missing ratings:
    *
    *   α = 1 − D_o/D_e,
    *   D_o = (1/n) Σ_i D_i/(m_i−1),  D_i = m_i² − Σ_c n_ic²,
    *   D_e = (n² − Σ_c n_c²) / (n(n−1))
    *
    * with n = Σ m_i pairable ratings (items with m_i ≥ 2; singletons
    * carry no pairs, and items beyond maxRaters would break the lcm
    * bound — both are dropped and counted in `n_items_dropped`).
    * The per-item denominators (m_i − 1) would force rational
    * arithmetic — the exact-integer trick is the bounded-rater lcm:
    * with m_i ≤ maxRaters, L = lcm(1…maxRaters−1) clears every
    * denominator, so do_scaled = Σ_i (L/(m_i−1))·D_i is an integer and
    *
    *   α = [L·de_num − do_scaled·(n−1)] / [L·de_num],
    *   de_num = n² − Σ_c n_c²
    *
    * emitted as the EXACT (alpha_num, alpha_den) pair, never divided
    * (α is legitimately negative; negative integer-division truncation
    * is engine-specific — the κ precedent). int64-safe to n ≈ 10⁶
    * ratings at maxRaters ≤ 8 (L = 420; L·de_num ≤ 4·10¹⁴·420); widen
    * the two products to DECIMAL(38,0) past that.
    *
    * Scale: one (item, label) count, one |items|-keyed aggregate, one
    * |vocabulary|-sized marginal — nothing pairwise, nothing driver-side.
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        labelCol: String, maxRaters: Int = 8): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 16, "lcm grows fast; keep <= 16")
    val L = (1 until maxRaters).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val cnt = ratings.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nic"))
    val items = cnt.groupBy(col(itemCol))
      .agg(sum(col("nic")).as("m"), sum(col("nic") * col("nic")).as("s2"))
    val kept = items.filter(col("m") >= 2 && col("m") <= maxRaters)
    val totals = kept.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("m")), lit(0L)).as("n_values"),
      // div, not / — the slash on longs is Spark's DOUBLE division;
      // L div (m−1) is exact by construction of the lcm
      coalesce(sum((col("m") * col("m") - col("s2")) *
        expr(s"$L div (m - 1)")), lit(0L)).as("do_scaled"))
    val dropped = items.filter(col("m") < 2 || col("m") > maxRaters)
      .agg(count(lit(1)).as("n_items_dropped"))
    // marginals over PAIRABLE items only
    val marg = cnt.join(kept.select(col(itemCol)), Seq(itemCol))
      .groupBy(col(labelCol)).agg(sum(col("nic")).as("nc"))
      .agg(coalesce(sum(col("nc") * col("nc")), lit(0L)).as("sc2"))
    totals.crossJoin(broadcast(dropped)).crossJoin(broadcast(marg))
      .select(col("n_items"), col("n_items_dropped"), col("n_values"),
        col("do_scaled"),
        (col("n_values") * col("n_values") - col("sc2")).as("de_num"))
      .withColumn("alpha_num",
        lit(L) * col("de_num") - col("do_scaled") * (col("n_values") - 1))
      .withColumn("alpha_den", lit(L) * col("de_num"))
  }

  /** Streaming consensus over an unbounded vote stream. Structured
    * Streaming forbids chained aggregations, so the stateful layer is
    * the SINGLE (item, label) count in complete mode — state bounded by
    * |items| × |label vocabulary|, the right shape for a finite
    * annotation campaign (an unbounded item space would want
    * watermarked windows instead) — and the second level (the
    * consensus pick) runs as a BATCH aggregate over each emitted count
    * snapshot inside foreachBatch: the standard two-level workaround,
    * here reusing the exact batch code so stream ≡ batch by
    * construction (asserted against independently-computed batch
    * output in LabelVoteStreamSpec).
    *
    * `onBatch` receives the full consensus table per micro-batch
    * (complete snapshots — each supersedes the last).
    */
  def majorityVoteStream(votes: DataFrame, itemCol: String, labelCol: String)(
      onBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    votes
      .groupBy(col(itemCol), col(labelCol).as("label"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        onBatch(consensusFromCounts(counts.toDF(), itemCol), batchId)
      }
      .start()

  /** Unbiased pass@k estimator (Chen et al. 2021, "Evaluating Large
    * Language Models Trained on Code", eq. 1): with n sampled
    * generations per task of which c pass, the probability that at
    * least one of k drawn samples passes is
    * pass@k = 1 - C(n-c, k)/C(n, k) — the numerically-stable product
    * form prod_{i=0..k-1} (n-c-i)/(n-i), kept EXACT here as an integer
    * numerator/denominator pair (never a float): with the per-task
    * sample cap maxN <= 32 and k <= 10 both products stay under
    * ~1.1e15 (int64-safe), and the parts-per-million score divides in
    * DECIMAL(38,0) (DuckDB: HUGEINT) since (den-num)*1e6 crosses 1e18.
    *
    * The estimator averages over tasks (the paper's protocol); the
    * mean is emitted exactly as sum_ppm div n_tasks alongside the
    * undivided sum. First maxN samples per task in sample-id order —
    * the deterministic stand-in for the paper's "draw n samples".
    *
    * Scale shape: one (task)-keyed window for the sample cap, one
    * task-keyed aggregation, then a k-sized explode of the TASK table
    * (tasks x |ks| rows, never samples x ks) and the final |ks|-row
    * rollup. The combinatorial products run once per task per k via a
    * sequence() fold over k terms, not a factorial table.
    */
  def passAtK(samples: DataFrame, taskCol: String, sampleIdCol: String,
              correctCol: String, ks: Seq[Int], maxN: Int = 32): DataFrame = {
    require(maxN >= 1 && maxN <= 32, "sample cap must be in [1, 32] for int64-exact products")
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 10), "each k must be in [1, 10]")
    import org.apache.spark.sql.expressions.Window
    val capped = samples
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(taskCol)).orderBy(col(sampleIdCol))))
      .filter(col("rn") <= maxN)
    val perTask = capped.groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("c"))
    val kArr = array(ks.map(k => lit(k.toLong)): _*)
    perTask
      .select(col("task"), col("n"), col("c"), explode(kArr).as("k"))
      .filter(col("k") <= col("n"))
      .withColumn("num", when(col("n") - col("c") < col("k"), lit(0L))
        .otherwise(expr(
          "aggregate(sequence(0L, k - 1L), 1L, (acc, i) -> acc * (n - c - i))")))
      .withColumn("den", expr(
        "aggregate(sequence(0L, k - 1L), 1L, (acc, i) -> acc * (n - i))"))
      .withColumn("pass_ppm", expr(
        "CAST(CAST(den - num AS DECIMAL(38,0)) * 1000000 div den AS BIGINT)"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(col("pass_ppm")).as("sum_ppm"))
      .withColumn("mean_pass_ppm", expr("sum_ppm div n_tasks"))
      .orderBy(col("k"))
  }

  /** DPO preference-pair construction (Rafailov et al. 2023 — the
    * data-prep step, not the loss): per prompt, pair the highest-
    * reward response (chosen) with the lowest (rejected). Ties on
    * reward break to the SMALLER response id on both sides, so the
    * pairing is fully deterministic; prompts whose responses all share
    * one reward produce NO pair (margin would be 0 — nothing to
    * prefer), and single-response prompts are skipped.
    *
    * One prompt-keyed aggregation: chosen and rejected ride two
    * struct-ordered min/max aggregates (lexicographic (reward, -id) /
    * (reward, id)), so the exchange carries one candidate pair per
    * prompt per map task — never the response list. Margin is the
    * exact reward difference.
    */
  def dpoPairs(responses: DataFrame, promptCol: String, idCol: String,
               rewardCol: String): DataFrame =
    responses
      .select(col(promptCol).as("prompt"), col(idCol).cast("long").as("rid"),
        col(rewardCol).cast("long").as("reward"))
      .groupBy(col("prompt"))
      .agg(count(lit(1)).as("n_responses"),
        max(struct(col("reward"), (-col("rid")).as("nid"))).as("mx"),
        min(struct(col("reward"), col("rid"))).as("mn"))
      .filter(col("n_responses") >= 2 &&
        col("mx.reward") > col("mn.reward"))
      .select(col("prompt"), col("n_responses"),
        (-col("mx.nid")).as("chosen_id"), col("mx.reward").as("chosen_reward"),
        col("mn.rid").as("rejected_id"), col("mn.reward").as("rejected_reward"),
        (col("mx.reward") - col("mn.reward")).as("margin"))

  /** Exact expected-calibration-error bins (Naeini et al. AAAI'15 /
    * Guo et al. ICML'17) — the classifier-calibration audit: bucket
    * predictions by confidence (basis points, 0..10000) into `nBins`
    * equal-width bins; per bin, the calibration gap is |accuracy −
    * mean confidence|, and ECE is the n-weighted gap sum. Both are
    * EXACT integers under one common scaling: gap_num_b =
    * |10000·n_correct_b − Σconf_b| (denominator 10000·n_b cancels into
    * the weighting), so ece_num = Σ_b gap_num_b over ece_den = 10000·n
    * — never a float, never a rounding-order hazard.
    *
    * Output: one row per (group, bin) carrying the bin stats plus the
    * group's (ece_num, ece_den) repeated — the reliability-diagram
    * table and the headline number from one pass. Plan: one exchange
    * on (group, bin) (map-side combined), then a group-keyed window
    * over ≤ nBins rows per group. Empty bins emit nothing (they
    * contribute 0 to ECE by definition).
    */
  def calibrationBins(df: DataFrame, groupCol: String, confBpCol: String,
                      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    df.select(col(groupCol).as("grp"),
        col(confBpCol).cast("long").as("conf_bp"),
        col(labelCol).cast("boolean").as("ok"))
      .withColumn("bin",
        least(expr(s"conf_bp * $nBins div 10000"), lit(nBins - 1L)))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_bin"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"),
        sum(col("conf_bp")).as("sum_conf_bp"))
      .withColumn("gap_num",
        abs(lit(10000L) * col("n_correct") - col("sum_conf_bp")))
      .withColumn("ece_num", sum(col("gap_num")).over(w))
      .withColumn("ece_den", lit(10000L) * sum(col("n_bin")).over(w))
      .withColumnRenamed("grp", groupCol)
  }

  /** Exact ROC-AUC per group via the Mann-Whitney U statistic — the
    * quality-classifier evaluation step (does the score actually rank
    * positives above negatives?). AUC = (Σ_{pos,neg} [s⁺>s⁻] +
    * ½[s⁺=s⁻]) / (n⁺·n⁻), i.e. rank statistics with MIDRANKS on ties —
    * emitted as the exact undivided pair (auc_num = 2·U, auc_den =
    * 2·n⁺·n⁻) in DECIMAL(38,0): at 100 TB group sizes n⁺·n⁻ leaves
    * int64 around n ≈ 3·10⁹ rows, and ½-midranks stay integral under
    * the ×2 scaling.
    *
    * Plan shape — never a global sort: rows pre-aggregate to one
    * (group, score) row with pos/neg counts (corpus-linear, map-side
    * combined; a hot score costs its row count once), then the
    * pairwise sum collapses to Σ_scores n⁺(s)·(2·cumNeg(<s) + n⁻(s))
    * via ONE cumulative window over the group's DISTINCT scores —
    * |scores| rows per group, not |rows|. Groups with one class emit
    * auc_den = 0 (AUC undefined; the consumer skips, nothing divides).
    *
    * The pair is EMITTED AS CANONICAL DECIMAL STRINGS ("123", "-5",
    * "0" — no exponent, no trailing zeros): the value class is exact
    * unbounded integers, and a string is the one representation every
    * downstream reader (Arrow decimal128, pandas — which flattens
    * DECIMAL to lossy float64 — JSON, cross-engine hashes) round-trips
    * without canonicalization drift. Consumers needing arithmetic cast
    * back to DECIMAL(38,0) losslessly.
    */
  def aucStats(df: DataFrame, groupCol: String, scoreCol: String,
               labelCol: String): DataFrame = {
    // guard the silent failure mode: a float probability column cast
    // to long collapses every score to 0 and "reports" AUC = 1/2 —
    // quantize first (floor(p·k) — ranks are scale-invariant, so any k
    // preserving the order gives the identical AUC)
    df.schema.find(_.name == scoreCol).foreach { f =>
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
      val fractional = f.dataType match {
        case DoubleType | FloatType => true
        case d: DecimalType => d.scale > 0
        case _ => false
      }
      require(!fractional,
        s"aucStats: $scoreCol is ${f.dataType.simpleString} — a long cast " +
          "would truncate probabilities to 0 (AUC = 1/2 for any input); " +
          "quantize to integers first, e.g. floor(p * 1000000)")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(groupCol).as("grp"), col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("pos"))
      .groupBy(col("grp"), col("s"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      .withColumn("cum_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np").cast("decimal(38,0)") *
          (lit(2L) * col("cum_below") + col("nn")))
          .cast("decimal(38,0)").cast("string").as("auc_num"))
      .withColumn("auc_den",
        (lit(2L) * col("n_pos").cast("decimal(38,0)") * col("n_neg"))
          .cast("decimal(38,0)").cast("string"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Group-relative advantage (the GRPO data-prep step, Shao et al.
    * 2024 §4.1): per prompt group of sampled responses, each response's
    * advantage is its reward centered on the group mean — the
    * baseline-free policy-gradient signal. Emitted EXACTLY as the
    * undivided pair (adv_num = n·r − Σr, n): the mean division would be
    * inexact, and the trainer divides once at consumption. ALL the
    * moment arithmetic rides DECIMAL(38,0) — at 100 TB group sizes
    * n·r, Σr and n·Σr² all leave int64 in the same magnitude class,
    * and the repo's ansi mode would throw on the first wrap — so a
    * z-normalizing consumer (advantage whitening) has both moments
    * without a second pass. Single-response groups emit adv_num = 0
    * and var_num = 0 — a lone sample carries no relative signal, which
    * is the GRPO semantics. As in [[aucStats]], the two unbounded
    * moments leave the operator as canonical decimal strings — exact
    * and canonicalization-proof through pandas/Arrow/JSON readers.
    *
    * Plan: one window over the group key — a single exchange, three
    * partial-aggregated moments (n, Σr, Σr²) broadcast back onto the
    * rows by the window, no join, no second scan.
    */
  def grpoAdvantage(responses: DataFrame, promptCol: String, idCol: String,
                    rewardCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("prompt"))
    responses
      .select(col(promptCol).as("prompt"), col(idCol).cast("long").as("rid"),
        col(rewardCol).cast("long").as("reward"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum_r",
        sum(col("reward").cast("decimal(38,0)")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_r2",
        sum(col("reward").cast("decimal(38,0)") * col("reward")).over(w))
      .select(col("prompt"), col("rid"), col("reward"), col("n"),
        (col("n").cast("decimal(38,0)") * col("reward") - col("sum_r"))
          .cast("decimal(38,0)").cast("string").as("adv_num"),
        (col("n").cast("decimal(38,0)") * col("sum_r2") -
          col("sum_r") * col("sum_r")).cast("decimal(38,0)")
          .cast("string").as("var_num"))
  }
}
