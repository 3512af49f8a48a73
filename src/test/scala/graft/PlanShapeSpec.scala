package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profiling, Similarity, TextAnalysis}

/** Plan-shape guards for the round-8 second-wave operators: the scale
  * arguments in their scaladocs claim "no cartesian anywhere" and
  * "keyed joins only" — these assertions keep a future refactor from
  * silently introducing a nested-loop join or un-keying a shuffle.
  * (Fixture-level twin of the PLANS.md executed-plan audit.)
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  /** `allowScalarBroadcasts`: operators that crossJoin a broadcast
    * 1-row aggregate (corpus size, vocab size) legitimately plan
    * BroadcastNestedLoopJoins for it (the node recurs in the plan TEXT
    * once per consumer even though the broadcast itself is reused);
    * everything else must have none at all.
    */
  private def assertNoCartesian(df: org.apache.spark.sql.DataFrame,
      name: String, allowScalarBroadcasts: Boolean = false): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$name plan contains a cartesian product:\n$plan")
    if (!allowScalarBroadcasts)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plan contains a nested-loop join:\n$plan")
  }

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("substring/sparse/novelty/heldout/kanon plans have no cartesian joins") {
    assertNoCartesian(
      Dedup.exactSubstringPairs(docs, "text", "doc_id"), "exactSubstringPairs")
    assertNoCartesian(
      TextAnalysis.sparseNeighbors(docs, "text", "doc_id"), "sparseNeighbors",
      allowScalarBroadcasts = true) // broadcast(nDocs), 1 row
    assertNoCartesian(
      Dedup.ngramNovelty(docs, "text", "doc_id", 5), "ngramNovelty")
    assertNoCartesian(
      TextAnalysis.heldOutCrossEntropy(docs, "text", "doc_id", "lang"),
      "heldOutCrossEntropy",
      allowScalarBroadcasts = true) // broadcast(vocab), 1 row
    assertNoCartesian(
      Profiling.kAnonymity(docs,
        Seq("lang" -> col("lang"), "source" -> col("source")), 5),
      "kAnonymity")
  }

  test("scan-speed operators stay shuffle-free: gopher profile, sq8") {
    def assertNoExchange(df: org.apache.spark.sql.DataFrame,
        name: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name claims scan-speed but its plan shuffles:\n$plan")
    }
    assertNoExchange(
      TextAnalysis.ngramRepetition(docs, "text", "doc_id"), "ngramRepetition")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    assertNoExchange(
      Similarity.scalarQuantize(emb, "embedding", "vec_id"), "scalarQuantize")
  }

  test("document scans prune to the columns the operator touches") {
    // ngramRepetition needs (doc_id, text) only — lang/source/n_chars
    // must not reach the parquet reader
    val plan = TextAnalysis.ngramRepetition(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      s"scan must read the two used columns: $readSchema")
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"scan reads columns the query never touches: $readSchema")
  }
}
