package graft

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Independent-implementation agreement: graft's SQL-native MinHash+LSH
  * near-dup pipeline against Spark MLlib's MinHashLSH on the same
  * corpus. The two use different hash families and different banding,
  * so agreement on the verified pair set (exact Jaccard ≥ threshold on
  * each side's candidates) is evidence neither implementation's
  * candidate generation is dropping true pairs. MLlib's hashing is
  * seeded → the test is deterministic.
  */
class CrossValidationSpec extends SparkSpec {
  import spark.implicits._

  test("graft MinHash+LSH pairs == MLlib MinHashLSH pairs on a planted corpus") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog today"),   // near-dup of 0
      (2L, "completely different text about distributed query engines"),
      (3L, "completely different text about distributed query planners"), // near-dup of 2
      (4L, "an unrelated document mentioning neither foxes nor engines"),
      (5L, "yet another singleton about parquet footers and row groups"))
      .toDF("doc_id", "text")

    val graftPairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // MLlib path: distinct word-3-gram shingles → count vectors →
    // MinHashLSH approx self-join at Jaccard distance < 0.5
    val shingles = Dedup.wordShingles(docs, "text", "doc_id", 3)
      .groupBy("doc_id").agg(collect_list("shingle").as("grams"))
    val cv = new CountVectorizer().setInputCol("grams").setOutputCol("features")
      .fit(shingles)
    val vectorized = cv.transform(shingles)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(vectorized)
    val mllibPairs = model.approxSimilarityJoin(vectorized, vectorized, 0.5, "dist")
      .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .as[(Long, Long)].collect().toSet

    assert(graftPairs == Set((0L, 1L), (2L, 3L)))
    assert(mllibPairs == graftPairs)
  }
}
