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
}
