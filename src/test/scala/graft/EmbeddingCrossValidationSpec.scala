package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Full-corpus exact-vs-ANN agreement for the embedding near-dup family.
  *
  * The catalog deliberately never benchmarks exact all-pairs cosine over
  * the whole corpus (the exact queries are bounded to a fixed audit
  * subset — see SimilarityQueries.exactCap); the full-corpus equivalence
  * evidence lives HERE instead: on the sf0.001 fixture (the entire
  * 500-vector corpus) the sub-quadratic LSH screen is compared against
  * ground truth computed by the exact grid-blocked operator.
  *
  * Three properties pin the relationship:
  *  1. precision 1.0 — every ANN pair is an exact pair with the identical
  *     cosine (the verify step computes the same fold, so this is exact
  *     set containment, not approximate agreement);
  *  2. recall floor — the Hamming≤1 multi-probe screen must retain the
  *     bulk of the true pair set on real fixture data;
  *  3. cluster refinement — ANN connected components are a refinement of
  *     exact components (every ANN edge is a true edge, so an ANN
  *     component can never span two exact components).
  */
class EmbeddingCrossValidationSpec extends SparkSpec {

  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private lazy val exactPairs = pairSet(
    Similarity.cosineNearDuplicates(emb, threshold = 0.4))
  private lazy val annPairs = pairSet(
    Similarity.annNearDuplicates(emb, threshold = 0.4, planes = 4))

  test("ANN pairs are a subset of exact pairs with identical cosines (precision 1)") {
    assert(annPairs.nonEmpty)
    annPairs.foreach { case (pair, sim) =>
      assert(exactPairs.contains(pair), s"ANN emitted a non-pair $pair")
      assert(exactPairs(pair) == sim, s"cosine mismatch on $pair")
    }
  }

  test("ANN screen recall on the full fixture corpus stays above the floor") {
    val recall = annPairs.size.toDouble / exactPairs.size
    // planes=4 Hamming≤1 multi-probe; the floor is deliberately below the
    // measured value so fixture regeneration can't flake the suite, but
    // high enough that a broken screen (e.g. probe set not symmetric)
    // fails loudly.
    assert(exactPairs.nonEmpty)
    assert(recall >= 0.5, f"recall $recall%.3f < 0.5 (${annPairs.size}/${exactPairs.size})")
  }

  test("ANN connected components refine exact components") {
    def components(pairs: Iterable[(Long, Long)]) = {
      import spark.implicits._
      Dedup.connectedComponents(
          pairs.toSeq.toDF("id_a", "id_b").withColumn("sim", lit(1.0)), "vec_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val exactComp = components(exactPairs.keys)
    val annComp = components(annPairs.keys)
    // every ANN component maps into exactly one exact component
    annComp.groupBy(_._2).foreach { case (annId, members) =>
      val exactIds = members.keys.map(exactComp).toSet
      assert(exactIds.size == 1,
        s"ANN component $annId spans exact components $exactIds")
    }
  }
}
