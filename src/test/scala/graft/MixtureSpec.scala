package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Waterfill invariants that must hold for ANY input, not just the
  * fixture: the allocation exhausts the budget exactly, never exceeds
  * a domain's repetition cap, and spreads the water level evenly
  * (uncapped domains differ by at most one token).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def check(toks: Seq[(String, Long)], repCap: Int,
                    num: Int, den: Int): Unit = {
    val in = toks.toDF("source", "toks")
    val out = Mixture.waterfill(in, "source", "toks", repCap, num, den)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = toks.map(_._2).sum
    val budget = (num.toLong * total) / den
    val capTotal = toks.map(_._2 * repCap).sum
    // budget beyond the cap ceiling can't be spent: everyone caps out
    assert(out.map(_._4).sum === math.min(budget, capTotal))
    out.foreach { case (_, t, cap, alloc) =>
      assert(cap === t * repCap)
      assert(alloc <= cap)
      assert(alloc >= 0)
    }
    val uncapped = out.filter { case (_, _, cap, alloc) => alloc < cap }.map(_._4)
    if (uncapped.nonEmpty)
      assert(uncapped.max - uncapped.min <= 1)
  }

  test("binding budget: small domains cap, big ones split the rest") {
    check(Seq(("a", 10L), ("b", 100L), ("c", 1000L), ("d", 10000L)), 3, 3, 2)
  }

  test("loose budget: every domain capped, allocation = cap ceiling") {
    check(Seq(("a", 10L), ("b", 20L)), 2, 10, 1)
  }

  test("uniform domains: remainder spreads one token each") {
    // budget 3·700/2 = 1050 over 7 equal domains of cap 300:
    // level 150, remainder 0; then a lopsided variant with remainder
    check((1 to 7).map(i => (s"s$i", 100L)), 3, 3, 2)
    check((1 to 7).map(i => (s"s$i", 101L)), 3, 3, 2)
  }

  test("single domain") {
    check(Seq(("only", 12345L)), 3, 3, 2)
  }

  test("zero-token domain is dropped, not a division error") {
    // toks = 0 → cap = 0: unguarded this is div-by-zero in epochs_bp
    // (hard error under ANSI). The allocation for an empty domain IS 0,
    // expressed by omitting the row; everyone else is unaffected.
    val out = Mixture.waterfill(
        Seq(("a", 0L), ("b", 100L), ("c", 1000L)).toDF("source", "toks"),
        "source", "toks", 3, 3, 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(!out.contains("a"))
    assert(out.keySet === Set("b", "c"))
    // total still exhausts the budget: (3 * 1100) / 2 = 1650
    assert(out.values.sum === 1650L)
  }

  test("applyPlan keeps fully-capped domains wholesale; sample is deterministic") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val per = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("toks"))
    val plan = Mixture.waterfill(per, "source", "toks", 3, 3, 2)
    val applied = Mixture.applyPlan(docs, plan, "source", "doc_id", "n_chars")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val joined = applied
      .join(plan.select(col("source"), col("cap")), Seq("source"))
      .join(counts, Seq("source"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (alloc, nKept, cap, nTotal) =
        (r.getAs[Long]("alloc"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("cap"), r.getAs[Long]("n_total"))
      if (alloc == cap) assert(nKept === nTotal, s"capped ${r.getString(0)}")
      else assert(nKept <= nTotal)
    }
    val again = Mixture.applyPlan(docs, plan, "source", "doc_id", "n_chars")
    assert(applied.collect().toSet === again.collect().toSet)
  }

  test("fixture allocation is deterministic and budget-exact") {
    val per = graft.core.Tables.documents(spark, sf0001)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("toks"))
    val out = Mixture.waterfill(per, "source", "toks", 3, 3, 2)
    val total = per.agg(sum("toks")).collect()(0).getLong(0)
    assert(out.agg(sum("alloc")).collect()(0).getLong(0) === 3L * total / 2)
    val again = Mixture.waterfill(per, "source", "toks", 3, 3, 2)
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("temperature allocation: Σ alloc == budget; tail lifted vs proportional") {
    val per = Seq(("head", 1000000L), ("mid", 10000L), ("tail", 100L))
      .toDF("source", "n")
    val out = Mixture.temperatureAllocation(per, "source", "n", 100000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(out.values.sum == 100000L)
    // proportional shares: head 99%, tail ~0.01%; √-weights 1000/100/10
    // give tail 10/1110 ≈ 0.9% — two orders of magnitude lift
    assert(out("tail") * 1010100L > 100000L * 100L,
      "tail share must beat its proportional share")
    assert(out("head") < 95000L, "head share must be flattened")
  }

  test("temperature allocation: isqrt is exact at perfect-square boundaries") {
    // n = k² and k²−1 around a large k where double sqrt rounding can
    // land on k exactly for k²−1
    val k = 94906266L // floor(sqrt(2^53)) + rounding-hazard zone
    val per = Seq(("a", k * k), ("b", k * k - 1), ("c", 1L))
      .toDF("source", "n")
    val w = Mixture.temperatureAllocation(per, "source", "n", 1000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("w")).toMap
    assert(w("a") == k)
    assert(w("b") == k - 1, "isqrt(k²−1) must be k−1, not the rounded k")
    assert(w("c") == 1L)
  }

  test("temperature allocation: zero-count domains are excluded, not errors") {
    val per = Seq(("a", 100L), ("z", 0L)).toDF("source", "n")
    val rows = Mixture.temperatureAllocation(per, "source", "n", 10L).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a"))
    assert(rows.head.getAs[Long]("alloc") == 10L)
  }
}
