package graft

import graft.operators.Privacy

/** Erasure cascade (Privacy.erasureCascade / erase): the accounting
  * frame sums per table, the applied anti-join matches the counted
  * numbers, duplicate tombstones don't double-count, ids absent from
  * a table erase nothing, and the guard.
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    .toDF("doc_id", "text")
  private val embs = Seq(1L -> 0.1, 3L -> 0.3, 9L -> 0.9)
    .toDF("vec_id", "norm")

  test("per-table accounting: total, erased, kept") {
    val tomb = Seq(1L, 3L, 99L).toDF("id") // 99 hits nothing
    val out = Privacy.erasureCascade(
        Seq(("docs", docs, "doc_id"), ("embs", embs, "vec_id")), tomb, "id")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("docs") == ((4L, 2L, 2L)))
    assert(out("embs") == ((3L, 2L, 1L)))
  }

  test("erase() keeps exactly the rows the accounting counted as kept") {
    val tomb = Seq(1L, 3L).toDF("id")
    val kept = Privacy.erase(docs, "doc_id", tomb, "id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("duplicate tombstone ids do not double-count") {
    val tomb = Seq(1L, 1L, 1L).toDF("id")
    val out = Privacy.erasureCascade(
        Seq(("docs", docs, "doc_id")), tomb, "id")
      .collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((4L, 1L, 3L)))
  }

  test("empty tombstone set erases nothing; empty table list is rejected") {
    val none = Seq.empty[Long].toDF("id")
    val out = Privacy.erasureCascade(
        Seq(("docs", docs, "doc_id")), none, "id").collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((4L, 0L, 4L)))
    intercept[IllegalArgumentException] {
      Privacy.erasureCascade(Seq.empty, none, "id")
    }
  }
}
