package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** The native WordMinHashProfile expression must produce EXACTLY the
  * profile of the compositional explode+aggregate form — same band
  * signatures, same shingle-hash set, same n — on the real fixture
  * corpus. This is the bit-match proof that lets the seven word-shingle
  * dedup queries keep their unchanged DuckDB oracles.
  */
class WordMinHashProfileSpec extends SparkSpec {

  private def collectProfiles(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), to_json(col("band_sigs")).as("bs"),
        array_sort(col("sh_set")).as("sh"), col("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Long](2), r.getLong(3))))
      .toMap

  test("native word profile equals compositional profile on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val composed = collectProfiles(Dedup.dedupProfiles(
      Dedup.rawWordShingles(docs, "text", "doc_id", 3),
      "doc_id", bands = 8, rowsPerBand = 2))
    val native = collectProfiles(
      Dedup.wordDedupProfiles(docs, "text", "doc_id", 3,
        bands = 8, rowsPerBand = 2))
    assert(native.keySet == composed.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == composed(id), s"doc $id diverges")
    }
  }

  test("tokenization edges match: runs of whitespace, tabs, short docs, empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two"),                      // 2 tokens < n=3 → drops out
      (2L, "one two three four"),
      (3L, "  One\t\ttwo  THREE\nfour  "),  // ws runs + case + trim edges
      (4L, ""),                             // empty → drops out
      (5L, "\tlead tab keeps empty token"), // trim keeps \t → leading "" token
      (6L, "a b c")).toDF("doc_id", "text")
    val composed = collectProfiles(Dedup.dedupProfiles(
      Dedup.rawWordShingles(docs, "text", "doc_id", 3),
      "doc_id", bands = 4, rowsPerBand = 3))
    val native = collectProfiles(
      Dedup.wordDedupProfiles(docs, "text", "doc_id", 3,
        bands = 4, rowsPerBand = 3))
    assert(composed.keySet == Set(2L, 3L, 5L, 6L) &&
      native.keySet == composed.keySet)
    native.keySet.foreach(id => assert(native(id) == composed(id), s"doc $id diverges"))
  }
}
