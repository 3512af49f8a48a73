package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** The native CharMinHashProfile expression must produce EXACTLY the
  * profile of the compositional explode+aggregate form — same band
  * signatures, same shingle-hash set, same n — on the real fixture
  * corpus. This is the bit-match proof that lets q_ngram_jaccard keep
  * its unchanged oracle.
  */
class MinHashProfileSpec extends SparkSpec {

  private def collectProfiles(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), to_json(col("band_sigs")).as("bs"),
        array_sort(col("sh_set")).as("sh"), col("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Long](2), r.getLong(3))))
      .toMap

  test("native profile equals compositional profile on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val composed = collectProfiles(Dedup.dedupProfiles(
      Dedup.rawCharShingles(docs, "text", "doc_id", 12),
      "doc_id", bands = 8, rowsPerBand = 2))
    val native = collectProfiles(
      Dedup.charDedupProfiles(docs, "text", "doc_id", 12,
        bands = 8, rowsPerBand = 2))
    assert(native.keySet == composed.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == composed(id), s"doc $id diverges")
    }
  }

  test("short-text and odd-k edges match (text shorter than k drops out)") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijk"), (2L, "abcdefghijkl"),
      (3L, "ABC  DEF ghijél"), (4L, "")).toDF("doc_id", "text")
    val composed = collectProfiles(Dedup.dedupProfiles(
      Dedup.rawCharShingles(docs, "text", "doc_id", 12),
      "doc_id", bands = 4, rowsPerBand = 3))
    val native = collectProfiles(
      Dedup.charDedupProfiles(docs, "text", "doc_id", 12,
        bands = 4, rowsPerBand = 3))
    // doc 1 (11 chars) and doc 4 drop out in both forms
    assert(composed.keySet == Set(2L, 3L) && native.keySet == Set(2L, 3L))
    native.keySet.foreach(id => assert(native(id) == composed(id)))
  }
}
