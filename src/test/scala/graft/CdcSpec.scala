package graft

import graft.operators.{Cdc, TextAnalysis}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: latest change wins, deletes drop, inserts append, untouched stay") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", 10L, "U"), (1L, "a2", 20L, "U"), // two updates: seq 20 wins
      (2L, "xx", 5L, "D"),                        // delete key 2
      (9L, "new", 7L, "U")                        // insert unseen key
    ).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 9L -> "new"))
  }

  test("applyChanges: delete then later upsert of the same key resurrects it") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "x", 1L, "D"), (1L, "back", 2L, "U")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op").collect()
    assert(out.length == 1 && out(0).getString(1) == "back")
  }

  test("applyChanges: latest delete beats earlier upserts") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "x", 1L, "U"), (1L, "y", 9L, "D")).toDF("k", "v", "seq", "op")
    assert(Cdc.applyChanges(base, changes, Seq("k"), "seq", "op").count() == 0)
  }

  test("vocabulary ranks by frequency with exact cumulative coverage") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a b")).toDF("id", "text")
    val out = TextAnalysis.vocabulary(docs, "text", "id", 2)
      .orderBy("rank").collect()
    // counts: b=4, a=3, c=1; total 8
    assert(out.length == 2)
    assert(out(0).getString(1) == "b" && out(0).getLong(2) == 4 &&
      out(0).getLong(3) == 4 && out(0).getDouble(4) == 0.5)
    assert(out(1).getString(1) == "a" && out(1).getLong(3) == 7 &&
      out(1).getDouble(4) == 7.0 / 8)
  }

  test("vocabulary ties break lexicographically") {
    val docs = Seq((1L, "z y z y")).toDF("id", "text")
    val out = TextAnalysis.vocabulary(docs, "text", "id", 2).orderBy("rank").collect()
    assert(out(0).getString(1) == "y" && out(1).getString(1) == "z")
  }

  test("crossCorpusCandidates pairs only across sides") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // docs 1 and 2 (new side) are near-identical to 11 and 12 (ref
    // side) respectively; 1~2 are ALSO near-identical to each other but
    // must not pair (same side)
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "alpha beta gamma delta epsilon zeta eta iota"
    val newDocs = Seq((1L, t1), (2L, t1 + " kappa")).toDF("doc_id", "text")
    val refDocs = Seq((11L, t1), (12L, t2), (13L, "totally unrelated content here"))
      .toDF("doc_id", "text")
    def profs(df: org.apache.spark.sql.DataFrame) = Dedup.dedupProfiles(
      Dedup.rawWordShingles(df, "text", "doc_id", 3), "doc_id", 8, 2)
    val cands = Dedup.crossCorpusCandidates(profs(newDocs), profs(refDocs), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 11L)))
    assert(cands.forall { case (a, b) => a < 10 && b >= 10 },
      s"same-side pair leaked: $cands")
  }

  test("snapshotDiff: added/removed/changed/unchanged each land on the right key") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "body")
    val newSnap = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("id", "body")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }
}
