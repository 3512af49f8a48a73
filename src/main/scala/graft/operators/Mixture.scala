package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budgeted domain-mixture allocation — the data-mixing step a
  * pretraining pipeline runs before sampling: given per-domain token
  * counts, a repetition cap (max epochs any domain may be upsampled),
  * and a total token budget, decide how many tokens to draw from each
  * domain. Small domains are capped at `repCap` epochs; the remaining
  * budget spreads evenly across the big domains — exact integer
  * waterfilling, so Σ alloc == budget token-for-token.
  *
  * alloc_i = min(cap_i, τ) with cap_i = repCap·t_i and the water level
  * τ chosen so the total hits the budget; the integer remainder goes
  * one token each to the first remainder uncapped domains in
  * (cap asc, domain asc) order. Every value is an exact integer —
  * no floating-point shares — so the result is engine-portable and
  * auditable (the property Σ alloc == budget is asserted in
  * MixtureSpec, not hoped for).
  *
  * Scale: the only |rows|-sized work is the upstream token count (one
  * exchange on domain). The waterfill itself runs on |domains| rows —
  * thousands at most — so its single-partition windows (the WindowExec
  * "moving all data to a single partition" warning) are the SAME
  * hierarchical-smallness argument as Packing.packBins step 3: the
  * serial window touches |domains| rows, never |corpus|.
  */
object Mixture {

  /** Allocation table: (domain, toks, cap, alloc, epochs_bp).
    *
    * `budget` and `repCap` are numerators over `budgetDen`/1: budget =
    * budgetNum·T div budgetDen where T = Σ toks — expressing the budget
    * as a fraction of the corpus keeps the query fixture-independent.
    */
  def waterfill(perDomain: DataFrame, domainCol: String, tokCol: String,
                repCap: Int, budgetNum: Int, budgetDen: Int): DataFrame = {
    val tot = perDomain.agg(sum(col(tokCol)).as("T"))
    val full = Window.orderBy(col("cap"), col(domainCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pfxW = Window.orderBy(col("cap"), col(domainCol))
    val ranked = perDomain
      .select(col(domainCol), col(tokCol).cast("long").as("toks"))
      // a zero-token domain has nothing to allocate and would divide by
      // zero in epochs_bp (and in applyPlan's hash cut) — a hard error
      // under ANSI, not a null. Dropping it IS its allocation (0).
      .filter(col("toks") > 0)
      .crossJoin(broadcast(tot))
      .withColumn("cap", col("toks") * repCap)
      .withColumn("budget", expr(s"($budgetNum * T) div $budgetDen"))
      .withColumn("k", row_number().over(pfxW).cast("long"))
      .withColumn("pfx", sum(col("cap")).over(pfxW))
      .withColumn("n", count(lit(1)).over(full))
    // domain k is capped iff granting cap_k to it AND every later
    // domain still fits the budget: (pfx_{k-1}) + cap_k·(n-k+1) ≤ B
    val flagged = ranked.withColumn("capped",
      (col("pfx") - col("cap")) + col("cap") * (col("n") - col("k") + 1)
        <= col("budget"))
    val solved = flagged
      .withColumn("kstar", coalesce(
        max(when(col("capped"), col("k"))).over(full), lit(0L)))
      .withColumn("pks", coalesce(
        max(when(col("k") === col("kstar"), col("pfx"))).over(full), lit(0L)))
      // CASE-guarded: with budget ≥ Σcap every domain is capped
      // (kstar = n) and the water level is never consulted — but the
      // projection still evaluates it for every row, and ANSI mode
      // makes an unguarded div-by-zero a hard error, not a null
      .withColumn("level",
        expr("CASE WHEN n > kstar THEN (budget - pks) div (n - kstar) ELSE 0 END"))
      .withColumn("rem",
        expr("CASE WHEN n > kstar THEN (budget - pks) % (n - kstar) ELSE 0 END"))
    solved
      .withColumn("alloc",
        when(col("k") <= col("kstar"), col("cap"))
          .otherwise(col("level") +
            when(col("k") - col("kstar") <= col("rem"), lit(1L)).otherwise(lit(0L))))
      .withColumn("epochs_bp", expr("alloc * 10000 div toks"))
      .select(col(domainCol), col("toks"), col("cap"), col("alloc"), col("epochs_bp"))
  }

  /** Apply a [[waterfill]] plan as a deterministic per-domain hash
    * sample and audit the realization: each domain keeps rows whose
    * md5-prefix falls under an integer cut `(alloc · 65536) div cap`
    * (the same 16-bit hash-space cut as `Sampling.splitTag`, but with a
    * per-domain data-dependent fraction computed in pure integer
    * arithmetic — no float round() whose half-case differs across
    * engines). Fully-capped domains (alloc == cap) keep everything
    * explicitly — their cut would be 65536 = '10000', which a 4-hex
    * prefix comparison mis-orders.
    *
    * Emits per domain: the plan's alloc target, rows kept, token mass
    * kept, and realized epochs in basis points — the number an operator
    * compares against the plan's `epochs_bp` to see how faithfully a
    * 1/65536-granular hash cut tracks the waterfill at this corpus
    * size. Membership is a pure function of (id, plan), so the sample
    * is reproducible across engines, runs, and partitioning.
    */
  def applyPlan(rows: DataFrame, plan: DataFrame, domainCol: String,
                idCol: String, tokCol: String): DataFrame = {
    val hx = substring(md5(col(idCol).cast("string")), 1, 4)
    // cap > 0 guard: waterfill never emits cap = 0 rows, but a
    // hand-built plan might — and Or short-circuiting is an optimizer
    // detail, not a guarantee, so the division is CASE-guarded rather
    // than left to evaluation order (ANSI div-by-zero is a hard error)
    val keep = col("alloc") === col("cap") ||
      hx < format_string("%04x",
        expr("CASE WHEN cap > 0 THEN (alloc * 65536) div cap ELSE 0 END"))
    rows.join(broadcast(plan), Seq(domainCol))
      .filter(keep)
      .groupBy(col(domainCol))
      .agg(first(col("alloc")).as("alloc"),
        count(lit(1)).as("n_kept"),
        sum(col(tokCol)).as("kept_toks"),
        first(col("toks")).as("toks"))
      .withColumn("realized_bp",
        expr("CASE WHEN toks > 0 THEN kept_toks * 10000 div toks ELSE 0 END"))
      .select(col(domainCol), col("alloc"), col("n_kept"),
        col("kept_toks"), col("realized_bp"))
  }

  /** Temperature-sampled mixture allocation at α = 1/2 (the mC4/XLM-R
    * upsampling rule p_i ∝ n_i^α that boosts low-resource domains):
    * weights w_i = ⌊√n_i⌋ as EXACT integer square roots — the double
    * `sqrt` can land a whole integer off at perfect-square boundaries
    * for large n, so the floor is followed by a one-step correction
    * (s² > n → s−1; (s+1)² ≤ n → s+1) both engines compute identically
    * — then a largest-remainder apportionment of `budget`:
    * quota_i = ⌊B·w_i / W⌋ and the Σ remainder-ranked domains
    * (rem desc, domain asc) each take one extra unit, so
    * Σ alloc == budget exactly (asserted in MixtureSpec). Zero-weight
    * domains (n = 0) are excluded from the apportionment.
    *
    * Contrast with [[waterfill]]: waterfill CAPS repetition under a
    * budget surplus; temperature allocation RESHAPES shares (flattens
    * the head, lifts the tail) regardless of caps. Production mixes
    * typically run temperature first, then waterfill the result.
    *
    * Scale: same shape as waterfill — all |rows|-sized work is the
    * upstream count; every window here runs over |domains| rows.
    */
  def temperatureAllocation(perDomain: DataFrame, domainCol: String,
                            nCol: String, budget: Long): DataFrame = {
    val s0 = floor(sqrt(col(nCol).cast("double"))).cast("long")
    val isqrt = when(s0 * s0 > col(nCol), s0 - 1)
      .when((s0 + 1) * (s0 + 1) <= col(nCol), s0 + 1)
      .otherwise(s0)
    val wAll = Window.partitionBy()
    val base = perDomain
      .withColumn("w", isqrt)
      .filter(col("w") > 0)
      .withColumn("wsum", sum(col("w")).over(wAll))
      // B·w fits DECIMAL(38,0) at any realistic (budget, corpus); the
      // div/% pair is the exact quotient/remainder both engines share
      .withColumn("quota", expr(s"CAST(w AS DECIMAL(38,0)) * $budget div wsum"))
      .withColumn("rem",
        expr(s"CAST(CAST(w AS DECIMAL(38,0)) * $budget % wsum AS BIGINT)"))
    base
      .withColumn("leftover", lit(budget) - sum(col("quota")).over(wAll))
      .withColumn("rr", row_number().over(
        Window.orderBy(desc("rem"), asc(domainCol))).cast("long"))
      .withColumn("alloc",
        col("quota") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
      .select(col(domainCol), col(nCol), col("w"), col("alloc"))
  }
}
