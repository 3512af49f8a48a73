package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer-training rounds — the merge-table builder
  * behind subword vocabulary induction, run the way production BPE
  * trainers do it at corpus scale: against the (word, count) table, not
  * the raw token stream, so every pass is |vocab|-sized regardless of
  * corpus size.
  *
  * Each round is fully declarative (no driver-side argmax): count
  * adjacent symbol pairs weighted by word frequency (lead window +
  * sum aggregate), pick the winner by (count DESC, pair ASC) via a
  * 1-row TakeOrdered that is then BROADCAST into the re-symbolization,
  * and apply the merge greedily left-to-right in one window pass.
  * Greedy non-overlap needs no sequential scan: for a pair (A,B) with
  * A≠B two adjacent matches cannot overlap (match at i+1 would need
  * sym(i+1)=A=B), so only self-pairs (A,A) chain — and there a maximal
  * run of c consecutive matches merges exactly at the odd positions of
  * the run (⌈c/2⌉ merges — ⌊m/2⌋ for a run of m identical symbols),
  * which is gaps-and-islands + parity, all window functions.
  *
  * Scale: every window partitions by `w` — hashpartitioning(w)
  * satisfies the (w, mflag[, isl]) clustering requirements, so each
  * round is ONE exchange plus in-partition sorts. The symbol table is
  * localCheckpoint'ed per round: the pair-count branch and the
  * re-symbolized frame share one materialization instead of compounding
  * the lineage (the naive lazy form re-evaluates the full prefix per
  * round — exponential in rounds).
  *
  * Determinism: lowercase [a-z]+ words, ASCII 1-based substrings,
  * integer counts, total-ordered argmax — engine-exact, mirrored
  * stage-by-stage by the unrolled DuckDB oracle.
  */
object Bpe {

  /** `rounds` BPE merge rounds over the word-count table of `textCol`.
    * Returns (merge_round, left_sym, right_sym, pair_count) — one row
    * per round in merge order.
    */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val words = docs
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var syms = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("pos"))
      .withColumn("sym", expr("substring(w, pos, 1)"))

    val wW = Window.partitionBy(col("w")).orderBy(col("pos"))
    val bests = Seq.newBuilder[DataFrame]
    // Round N's symbol snapshot is dead once round N+1's materializes
    // (and the LAST one once the loop ends — the returned frame is the
    // union of the tiny argmax checkpoints only), so each round drops
    // the previous round's blocks: resident state is O(1) rounds, the
    // same discipline as Dedup.connectedComponents. The argmax
    // checkpoints are the output and stay.
    val sc = docs.sparkSession.sparkContext
    var prevSnapRdds: Iterable[org.apache.spark.rdd.RDD[_]] = Nil
    for (round <- 1 to rounds) {
      val before = sc.getPersistentRDDs.keySet
      val snap = syms.localCheckpoint()
      val snapRdds = (sc.getPersistentRDDs -- before).values.map { r =>
        r.setName(s"graft.bpe round $round symbols"); r
      }
      prevSnapRdds.foreach(_.unpersist(blocking = false))
      prevSnapRdds = snapRdds
      val withNext = snap.withColumn("nxt", lead(col("sym"), 1).over(wW))
      // the 1-row argmax feeds two consumers (the merge-table output
      // union and the re-symbolization crossJoin) — checkpoint it so
      // the pair-count aggregate, the round's most expensive op, runs
      // once instead of twice
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("left_sym"), col("nxt").as("right_sym"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .localCheckpoint()
      bests += best.select(lit(round.toLong).as("merge_round"),
        col("left_sym"), col("right_sym"), col("pair_count"))

      syms = applyMerge(withNext,
        best.select(col("left_sym").as("bl"), col("right_sym").as("br")))
    }
    prevSnapRdds.foreach(_.unpersist(blocking = false))
    bests.result().reduce(_ union _)
  }

  /** Apply ONE merge pair (1-row frame with columns bl, br — broadcast)
    * greedily left-to-right to a (w, wc, pos, sym, nxt) symbol table:
    * the islands+parity machinery shared by training ([[merges]], where
    * the pair is the round's argmax) and encoding ([[encode]], where it
    * comes from a trained merge table).
    */
  private def applyMerge(withNext: DataFrame, pair: DataFrame): DataFrame = {
    val wW = Window.partitionBy(col("w")).orderBy(col("pos"))
    val wM = Window.partitionBy(col("w"), col("mflag")).orderBy(col("pos"))
    val flagged = withNext
      .crossJoin(broadcast(pair))
      .withColumn("mflag",
        coalesce(col("sym") === col("bl") && col("nxt") === col("br"),
          lit(false)))
      .withColumn("isl", col("pos") - row_number().over(wM))
    val wI = Window.partitionBy(col("w"), col("mflag"), col("isl"))
      .orderBy(col("pos"))
    flagged
      .withColumn("mrg", col("mflag") && row_number().over(wI) % 2 === 1)
      .withColumn("consumed", coalesce(lag(col("mrg"), 1).over(wW), lit(false)))
      .filter(!col("consumed"))
      .withColumn("pos2", row_number().over(wW))
      .select(col("w"), col("wc"), col("pos2").as("pos"),
        when(col("mrg"), concat(col("sym"), col("nxt"))).otherwise(col("sym"))
          .as("sym"))
  }

  /** BPE ENCODE — apply a trained merge table to tokenize the corpus:
    * the production-side twin of [[merges]] (a pipeline trains once,
    * then tokenizes every corpus refresh with the frozen table).
    *
    * The expensive iterated part runs at VOCABULARY scale, not corpus
    * scale: merges are applied round-by-round to the distinct-word
    * symbol table (same [[applyMerge]] machinery and localCheckpoint
    * round discipline as training), and the corpus only pays one linear
    * join at the end — (doc_id, word) occurrences against the finished
    * word→tokens map — plus one per-doc aggregate. Applying the merge
    * table in round order from the character level reproduces the
    * training end-state segmentation for in-vocabulary words (greedy
    * BPE is deterministic given the ordered table), which is what the
    * unrolled DuckDB oracle checks.
    *
    * `mergeTable` must have (merge_round, left_sym, right_sym) — the
    * [[merges]] output shape. It is checkpointed once so per-round
    * filters don't re-run an upstream training pipeline.
    *
    * Returns one row per doc with ≥1 word: (idCol, n_words, n_tokens,
    * token_str) where token_str is the space-joined subword sequence.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             mergeTable: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val docWords = docs
      .select(col(idCol),
        posexplode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
          .as(Seq("widx", "w")))
    val words = docWords.groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var syms = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("pos"))
      .withColumn("sym", expr("substring(w, pos, 1)"))

    // tiny (rounds×3) — checkpoint so the per-round filter doesn't
    // re-execute whatever produced the table (e.g. a training run)
    val mt = mergeTable.select(col("merge_round"), col("left_sym"),
      col("right_sym")).localCheckpoint()

    val wW = Window.partitionBy(col("w")).orderBy(col("pos"))
    val sc = docs.sparkSession.sparkContext
    var prevSnapRdds: Iterable[org.apache.spark.rdd.RDD[_]] = Nil
    for (round <- 1 to rounds) {
      val before = sc.getPersistentRDDs.keySet
      val snap = syms.localCheckpoint()
      val snapRdds = (sc.getPersistentRDDs -- before).values.map { r =>
        r.setName(s"graft.bpe-encode round $round symbols"); r
      }
      prevSnapRdds.foreach(_.unpersist(blocking = false))
      prevSnapRdds = snapRdds
      val withNext = snap.withColumn("nxt", lead(col("sym"), 1).over(wW))
      val pair = mt.filter(col("merge_round") === round)
        .select(col("left_sym").as("bl"), col("right_sym").as("br"))
      syms = applyMerge(withNext, pair)
    }
    // the result DEPENDS on the final snapshot (unlike merges(), whose
    // output is only the argmax checkpoints) — leave it pinned for the
    // caller's CacheScope sweep; release only the earlier rounds above

    val wordToks = syms.groupBy(col("w"))
      .agg(count(lit(1)).as("ntok"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, sym))), x -> x.sym)"))
          .as("toks"))
    docWords.join(wordToks, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_tokens"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(widx, toks))), x -> x.toks)"))
          .as("token_str"))
  }
}
