package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer — merge-table training and corpus
  * encoding, run the way production BPE trainers do it at corpus scale:
  * against the (word, count) table, not the raw token stream, so every
  * pass is |vocab|-sized regardless of corpus size.
  *
  * A word's symbol sequence is an `array<string>` COLUMN, and one merge
  * round is a left fold over it ([[foldMerge]], `aggregate`): append the
  * symbol, or — when the accumulator's last element is `left` and the
  * incoming symbol is `right` — replace the last element with their
  * concatenation. The fold IS greedy non-overlapping left-to-right
  * merging: an element the fold just created has value `left+right`,
  * which can never equal `left` (`right` is non-empty), so a merged
  * element can never left-match the same pair again in the same round —
  * exactly the "skip past a merge" rule. Self-pair runs fall out too: a
  * run of m identical symbols merges at the odd positions, ⌊m/2⌋ times
  * (`BpeSpec` pins both against a mutable reference implementation).
  *
  * Scale shape per TRAINING round: pair counts come from exploding the
  * zipped (arr, tail(arr)) slices — one shuffle for the count aggregate,
  * then a 1-row total-ordered argmax (TakeOrdered) that is BROADCAST
  * into the fold projection. No window functions, no per-round sort:
  * the fold is a pure data-parallel projection, so a round is exactly
  * ONE exchange. Rounds are inherently sequential (round N's counts
  * need round N-1's symbols); lineage across rounds is a chain of
  * cheap vocab-scale projections, checkpointed every few rounds so it
  * can neither re-run the corpus-scale word count nor grow unboundedly.
  *
  * ENCODING has no sequential structure at all once the table is
  * trained: applying the whole ordered merge table to a word is a
  * nested fold (outer over merges, inner over symbols), i.e. ONE
  * projection over the distinct-word table with the table broadcast as
  * a single array literal row — plan depth independent of vocabulary
  * size, and the corpus pays one linear join at the end.
  *
  * Determinism: lowercase [a-z]+ words, integer counts, total-ordered
  * argmax — engine-exact, mirrored stage-by-stage by the unrolled
  * DuckDB oracle.
  */
object Bpe {

  /** Initial symbol table: one char per array element (1-based
    * substring keeps parity with the oracle's ASCII slicing).
    */
  private def charArray(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** One greedy merge round as a left fold (see object doc for the
    * equivalence argument). `size(acc) = 0` is checked FIRST so the
    * ANSI-mode `element_at(acc, -1)` never sees an empty array (CASE
    * branches evaluate lazily).
    */
  private def foldMerge(arr: Column, bl: Column, br: Column): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, lit(-1)) === bl && x === br,
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, lit(-1)), x))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of `arr` as structs (l, r) — empty for
    * single-symbol words (slice of length 0).
    */
  private def pairStructs(arr: Column): Column =
    zip_with(slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Checkpoint `df`, naming the new blocks and releasing `prev`'s;
    * returns (snapshot, its RDDs) — the round-state discipline shared
    * with Dedup.connectedComponents (resident state stays O(1) rounds).
    */
  private def rollCheckpoint(df: DataFrame, name: String,
      prev: Iterable[org.apache.spark.rdd.RDD[_]])
      : (DataFrame, Iterable[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val snap = df.localCheckpoint()
    val rdds = (sc.getPersistentRDDs -- before).values.map { r =>
      r.setName(name); r
    }
    prev.foreach(_.unpersist(blocking = false))
    (snap, rdds)
  }

  /** Checkpoint the symbol chain every this many rounds: between
    * checkpoints a round's pair-count job re-executes at most this many
    * vocab-scale fold projections (cheap, pipelined in one stage), and
    * in exchange the chain skips one materialization job per round.
    */
  private val ckptEvery = 4

  /** `rounds` BPE merge rounds over the word-count table of `textCol`.
    * Returns (merge_round, left_sym, right_sym, pair_count) — one row
    * per round in merge order (rounds past pair exhaustion emit none).
    */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val words = docs
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    // checkpoint the initial table once: per-round pair-count jobs must
    // not re-run the corpus-scale word count
    var (syms, snapRdds) = rollCheckpoint(
      words.select(col("wc"), charArray(col("w")).as("arr")),
      "graft.bpe initial symbols", Nil)

    val bests = Seq.newBuilder[DataFrame]
    for (round <- 1 to rounds) {
      // the 1-row argmax feeds two consumers (the merge-table output
      // union and the fold projection) — checkpoint it so the pair
      // count, the round's only shuffle, runs once instead of twice
      val best = syms
        .select(col("wc"), explode(pairStructs(col("arr"))).as("p"))
        .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .localCheckpoint()
      bests += best.select(lit(round.toLong).as("merge_round"),
        col("left_sym"), col("right_sym"), col("pair_count"))

      syms = syms
        .crossJoin(broadcast(
          best.select(col("left_sym").as("bl"), col("right_sym").as("br"))))
        .select(col("wc"), foldMerge(col("arr"), col("bl"), col("br")).as("arr"))
      if (round % ckptEvery == 0 && round < rounds) {
        val rolled = rollCheckpoint(syms, s"graft.bpe round $round symbols", snapRdds)
        syms = rolled._1; snapRdds = rolled._2
      }
    }
    // the returned frame is the union of the tiny eager argmax
    // checkpoints only — the symbol chain's blocks are dead
    snapRdds.foreach(_.unpersist(blocking = false))
    bests.result().reduce(_ union _)
  }

  /** BPE ENCODE — apply a trained merge table to tokenize the corpus:
    * the production-side twin of [[merges]] (a pipeline trains once,
    * then tokenizes every corpus refresh with the frozen table).
    *
    * The whole ordered table (rounds ≤ `rounds`) is collapsed into one
    * array-of-structs row — `collect_list` under a global aggregate,
    * sorted by merge_round — broadcast into a single nested-fold
    * projection over the distinct-word table: outer fold over merges,
    * inner fold = [[foldMerge]]. Applying the table in round order from
    * the character level reproduces the training end-state segmentation
    * for in-vocabulary words (greedy BPE is deterministic given the
    * ordered table), which is what the unrolled DuckDB oracle checks.
    * The corpus then pays one linear join against the finished
    * word→tokens map plus one per-doc aggregate.
    *
    * `mergeTable` must have (merge_round, left_sym, right_sym) — the
    * [[merges]] output shape.
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

    // ONE row holding the ordered merge table as array<struct<l,r>> —
    // a global aggregate always emits exactly one row (empty table →
    // empty array → the fold applies no merges)
    val mtab = mergeTable
      .filter(col("merge_round") <= rounds)
      .select(struct(col("merge_round").as("rnd"), col("left_sym").as("l"),
        col("right_sym").as("r")).as("m"))
      .agg(sort_array(collect_list(col("m"))).as("mtab"))

    val wordToks = docWords.groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .crossJoin(broadcast(mtab))
      .select(col("w"),
        aggregate(col("mtab"), charArray(col("w")),
          (arr, m) => foldMerge(arr, m.getField("l"), m.getField("r")))
          .as("toks_arr"))
      .select(col("w"), size(col("toks_arr")).as("ntok"),
        concat_ws(" ", col("toks_arr")).as("toks"))

    docWords.join(wordToks, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_tokens"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(widx, toks))), x -> x.toks)"))
          .as("token_str"))
  }
}
