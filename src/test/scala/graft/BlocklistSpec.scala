package graft

import graft.functions.AhoCorasick
import org.apache.spark.sql.functions.col

/** Aho-Corasick blocklist matcher (functions.BlocklistHits): the
  * classic {he, she, his, hers} dictionary, overlapping-occurrence
  * counting (which no replace/regex trick reproduces), strict-null
  * contract, and the constructor guards.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq("he", "she", "his", "hers")

  private def hitsOf(text: String, phrases: Seq[String]): Seq[Long] = {
    val out = Seq(Option(text)).toDF("t")
      .select(AhoCorasick.blocklistHits(col("t"), phrases).as("h"))
      .collect()(0)
    out.getSeq[Long](0)
  }

  test("classic dictionary on 'ushers': suffix matches all fire at one position") {
    // position of 's h e r s': "she" ends at index 3, "he" ends at 3
    // (dictionary suffix of the same state), "hers" ends at 5.
    assert(hitsOf("ushers", dict) == Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences all count") {
    // "aa" in "aaaa" ends at positions 1, 2, 3
    assert(hitsOf("aaaa", Seq("aa")) == Seq(3L))
    // self-overlapping phrase with a border
    assert(hitsOf("ababab", Seq("abab")) == Seq(2L))
  }

  test("phrase equal to the whole text, and phrase longer than the text") {
    assert(hitsOf("his", dict) == Seq(0L, 0L, 1L, 0L))
    assert(hitsOf("h", dict) == Seq(0L, 0L, 0L, 0L))
    assert(hitsOf("", dict) == Seq(0L, 0L, 0L, 0L))
  }

  test("one phrase being a prefix of another counts both") {
    // h e r s h e y: "he" ends at 1 and 5, "she" at 3..5, "hers" at 0..3
    assert(hitsOf("hershey", dict) == Seq(2L, 1L, 0L, 1L))
  }

  test("null text is null out (strict-null contract)") {
    val out = Seq(Option.empty[String]).toDF("t")
      .select(AhoCorasick.blocklistHits(col("t"), dict).as("h"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("matching is case-sensitive by contract") {
    assert(hitsOf("He SHE his", dict) == Seq(0L, 0L, 1L, 0L))
  }

  test("empty phrase list and empty phrases are rejected") {
    intercept[IllegalArgumentException] {
      graft.functions.BlocklistHits(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("t")), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.functions.BlocklistHits(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("t")), Seq("a", ""))
    }
  }

  test("automaton survives serialization (executor shipping)") {
    val ac = AhoCorasick.build(dict)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac)
    oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val ac2 = ois.readObject().asInstanceOf[AhoCorasick]
    val r = ac2.hits(org.apache.spark.unsafe.types.UTF8String.fromString("ushers"))
    assert(r.toLongArray().toSeq == Seq(1L, 1L, 0L, 1L))
  }
}
