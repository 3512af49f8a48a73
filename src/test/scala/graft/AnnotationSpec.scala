package graft

import org.apache.spark.sql.functions._
import graft.operators.{Annotation, TextAnalysis}

/** Batch annotation/selection operators: Cohen's κ against hand-computed
  * confusion tables (including the κ < 0 case the integer num/den
  * contract exists for), and DSIR importance weights against the
  * definitional per-bucket recomputation.
  */
class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(pairs: Seq[(String, String)]): (Long, Long, Long, Long, Long) = {
    val r = Annotation.cohenKappa(
        pairs.toDF("label_a", "label_b"), "label_a", "label_b")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("perfect agreement: kappa_num == kappa_den (κ = 1)") {
    val (n, a, _, num, den) = kappa(Seq(("x", "x"), ("y", "y"), ("x", "x")))
    assert(n === 3 && a === 3)
    assert(num === den && den > 0)
  }

  test("textbook 2x2 confusion: κ = (A·N − P)/(N² − P) exactly") {
    // classic example: N=50, A=20+15=35, marginals a:(25,25) b:(30,20)
    // P = 25·30 + 25·20 = 1250 → num = 35·50 − 1250 = 500,
    // den = 2500 − 1250 = 1250 → κ = 0.4
    val pairs =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val (n, a, p, num, den) = kappa(pairs)
    assert((n, a, p) === ((50L, 35L, 1250L)))
    assert((num, den) === ((500L, 1250L)))
  }

  test("systematic disagreement yields negative κ — numerator sign survives") {
    // raters always flip: A=0; marginals a:(2,2) b:(2,2), P = 2·2+2·2 = 8
    // num = 0·4 − 8 = −8, den = 16 − 8 = 8 → κ = −1
    val (_, a, _, num, den) = kappa(
      Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")))
    assert(a === 0)
    assert(num === -8L && den === 8L)
  }

  test("label used by only one rater contributes nothing to chance agreement") {
    // b-only label "z": P must count only shared labels
    val (_, _, p, _, _) = kappa(Seq(("x", "x"), ("x", "z")))
    // marginals: a x:2; b x:1, z:1 → shared label x: 2·1 = 2
    assert(p === 2L)
  }

  test("importance weights: target-heavy doc outscores corpus-average doc") {
    // target docs speak 'alpha', the rest 'beta'; a fresh doc of all
    // 'alpha' must outscore one of all 'beta'
    val docs = (
      (1 to 5).map(i => (i.toLong, "alpha alpha alpha", "en")) ++
      (6 to 10).map(i => (i.toLong, "beta beta beta", "de")) ++
      Seq((11L, "alpha alpha alpha alpha", "de"), (12L, "beta beta beta beta", "de"))
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.importanceWeights(docs, "text", "doc_id",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(11L)._1 === 4L)
    assert(out(11L)._2 > out(12L)._2,
      "all-target-vocabulary doc must carry the larger importance weight")
    // definitional check on doc 12 (all 'beta'): w = (tgt+1)(T_all+256)e6
    // div ((all+1)(T_tgt+256)); beta: tgt=0, all=19; totals: T_all=38, T_tgt=15
    val wBeta = (1L * (38L + 256) * 1000000L) / (20L * (15L + 256))
    assert(out(12L)._2 === 4L * wBeta)
  }

  test("krippendorffAlpha: hand-computed α on perfect / mixed / systematic / zero cases") {
    def alpha(rows: Seq[(Long, String)]) =
      Annotation.krippendorffAlpha(rows.toDF("item_id", "label"),
        "item_id", "label").collect().head

    // perfect agreement → α = 1
    val p = alpha(Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")))
    assert(p.getAs[Long]("alpha_num") == p.getAs[Long]("alpha_den"))

    // textbook mixed case {xx, xy, yy}: Do = 1/3, De = 3/5 → α = 4/9
    val m = alpha(Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"),
      (3L, "y"), (3L, "y")))
    assert(m.getAs[Long]("alpha_num") * 9 == m.getAs[Long]("alpha_den") * 4)

    // systematic disagreement over I=5 items → α = −(I−1)/I = −4/5
    val s = alpha((1L to 5L).flatMap(i => Seq((i, "x"), (i, "y"))))
    assert(s.getAs[Long]("alpha_num") * 5 == s.getAs[Long]("alpha_den") * -4)

    // single item [x,x,y] (variable m, odd denominator): Do = De → α = 0;
    // the singleton and the >maxRaters item are dropped AND counted
    val v = alpha(Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x")) ++
      (1L to 9L).map(_ => (3L, "x")))
    assert(v.getAs[Long]("alpha_num") == 0L && v.getAs[Long]("alpha_den") > 0L)
    assert(v.getAs[Long]("n_items_dropped") == 2L)
    assert(v.getAs[Long]("n_values") == 3L)
    assert(v.getAs[Long]("do_scaled") == 840L)
  }

  test("grpoAdvantage: hand-computed moments, zero-sum and singleton") {
    import graft.operators.Annotation
    val rows = Seq(
      ("p1", 1L, 10L), ("p1", 2L, 20L), ("p1", 3L, 60L), // Σ=90, Σr²=4100
      ("p2", 4L, 7L)) // singleton — no relative signal
      .toDF("prompt", "rid", "reward")
    val out = Annotation.grpoAdvantage(rows, "prompt", "rid", "reward")
      .collect().map(r => r.getAs[Long]("rid") -> r).toMap

    def adv(id: Long): Long =
      out(id).getAs[String]("adv_num").toLong
    // adv_num = n·r − Σr: 3·10−90 = −60, 3·20−90 = −30, 3·60−90 = 90
    assert(adv(1L) == -60L)
    assert(adv(2L) == -30L)
    assert(adv(3L) == 90L)
    // the invariant GRPO relies on: group advantages sum to zero
    assert(Seq(1L, 2L, 3L).map(adv).sum == 0L)
    // var_num = n·Σr² − (Σr)² = 3·4100 − 8100 = 4200, same on every row
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[String]("var_num") == "4200")
      assert(out(id).getAs[Long]("n") == 3L)
    }
    // singleton: adv 0 (1·7−7), var 0 (1·49−49) — a lone sample is flat
    assert(adv(4L) == 0L)
    assert(out(4L).getAs[String]("var_num") == "0")
    // canonical decimal-string contract: plain integer repr, no
    // exponent, no decimal point, "-" only as sign (the reason the
    // moments leave as strings at all — see Annotation scaladoc)
    out.values.foreach { r =>
      Seq("adv_num", "var_num").foreach { c =>
        val sRepr = r.getAs[String](c)
        assert(sRepr.matches("-?(0|[1-9][0-9]*)"), s"$c = $sRepr")
        assert(sRepr == BigInt(sRepr).toString, s"$c = $sRepr")
      }
    }
  }

  test("aucStats: midrank tie, perfect, reversed, one-class groups") {
    import graft.operators.Annotation
    val rows = Seq(
      // "t": pos scores {3, 2}, neg {1, 2} → one tied pair counts ½:
      // U = 3.5 → (auc_num, auc_den) = (7, 8)
      ("t", 3L, true), ("t", 2L, true), ("t", 1L, false), ("t", 2L, false),
      // "p": perfect separation → AUC 1 (8 / 8)
      ("p", 10L, true), ("p", 9L, true), ("p", 1L, false), ("p", 2L, false),
      // "r": reversed ranking → AUC 0
      ("r", 1L, true), ("r", 5L, false),
      // "o": one class only → den 0, nothing divides
      ("o", 4L, true), ("o", 5L, true))
      .toDF("grp", "score", "label")
    val out = Annotation.aucStats(rows, "grp", "score", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    def nd(g: String) = (out(g).getAs[String]("auc_num").toLong,
      out(g).getAs[String]("auc_den").toLong)
    assert(nd("t") == (7L, 8L))
    assert(nd("p") == (8L, 8L))
    assert(nd("r") == (0L, 2L))
    assert(nd("o") == (0L, 0L))
    assert(out("t").getAs[Long]("n_pos") == 2L)
    assert(out("t").getAs[Long]("n_neg") == 2L)
  }

  test("aucStats rejects fractional score columns (silent-0.5 guard)") {
    import graft.operators.Annotation
    intercept[IllegalArgumentException] {
      Annotation.aucStats(
        Seq(("g", 0.7, true), ("g", 0.3, false)).toDF("grp", "score", "label"),
        "grp", "score", "label")
    }
  }

  test("calibrationBins: hand gaps, top-edge bin clamp, calibrated zero") {
    import graft.operators.Annotation
    val rows = Seq(
      ("g", 500L, true), ("g", 999L, false), // bin 0: gap |10000-1499|
      ("g", 9999L, true), ("g", 10000L, true), // bin 9 (10000 clamps down)
      ("c", 5000L, true), ("c", 5000L, false)) // perfectly calibrated bin
      .toDF("grp", "conf_bp", "ok")
    val out = Annotation.calibrationBins(rows, "grp", "conf_bp", "ok")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val b0 = out(("g", 0L))
    assert(b0.getAs[Long]("n_bin") == 2L)
    assert(b0.getAs[Long]("n_correct") == 1L)
    assert(b0.getAs[Long]("sum_conf_bp") == 1499L)
    assert(b0.getAs[Long]("gap_num") == 8501L)
    val b9 = out(("g", 9L))
    assert(b9.getAs[Long]("n_bin") == 2L) // 10000 bp joined bin 9
    assert(b9.getAs[Long]("gap_num") == 1L)
    assert(b0.getAs[Long]("ece_num") == 8502L)
    assert(b0.getAs[Long]("ece_den") == 40000L)
    // a bin whose accuracy equals its mean confidence contributes 0
    val c5 = out(("c", 5L))
    assert(c5.getAs[Long]("gap_num") == 0L)
    assert(c5.getAs[Long]("ece_num") == 0L)
    assert(out.size == 3) // empty bins emit nothing
  }
}
