package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** h = fold(h·31 + code(c)) mod 1e9+7 over a string's characters — the
  * document rolling hash of [[graft.operators.TextAnalysis.rollingHash]]
  * as ONE scalar expression.
  *
  * Bit-identical to the compositional HOF form
  * `aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t,
  * i, 1))), 0L, (acc, c) -> (acc*31 + c) % 1000000007)`: `substring`
  * slices by codepoint and Spark's `ascii` returns the full CODEPOINT
  * of the first character (probed on astral input — 😀 → 128512, not
  * its surrogate), which is also DuckDB `ascii`'s definition, so the
  * fold is engine-portable beyond the BMP ([[RollingHashSpec]] pins the
  * native expression against the composition on astral cases). The HOF
  * form materializes an int array per row and boxes every lambda step;
  * this is one register loop over the decoded string — scan-speed, no
  * allocation beyond the String decode.
  *
  * Same preference-order (b) rationale as [[DotProduct]] /
  * [[CharMinHashProfile]]: compose built-ins first, drop to a native
  * expression only when the composition allocates on the hot path.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(t: Any): Any =
    RollingHash.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  private val Mod = 1000000007L

  /** Fold in codepoint order; each codepoint contributes its full
    * value (ascii() semantics — see class doc).
    */
  def compute(t: UTF8String): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-level entry point. */
  def rollingHash(t: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(t)))
}

/** Per-document character-frequency entropy statistics in one loop:
  * `struct(n_chars, distinct_chars, diversity_bits)` with
  * `diversity_bits = Σ_c m_c · (⌊log2 L⌋ − ⌊log2 m_c⌋)` over the
  * codepoint frequency table {c → m_c, Σm = L} — the integer-exact
  * entropy bound of [[graft.operators.TextAnalysis.charDiversity]].
  *
  * Value-identical to the compositional sorted-array `aggregate` fold
  * (TextAnalysisSpec pins the hand-fold; the q_char_entropy DuckDB
  * oracle gates the composed result): characters are Unicode CODE
  * POINTS exactly like `substring(t, i, 1)` enumerates them, equality
  * is codepoint equality. The HOF fold is CodegenFallback and
  * allocates a struct per character (measured 3.9 s at sf0.1); this is
  * one int-array sort + run scan per row — scan-speed. Same
  * preference-order (b) rationale as [[RollingHash]].
  *
  * Null for strings that are empty (no characters — matches the
  * `length(t) >= 1` filter of the compositional form).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropyStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "char_entropy_stats"

  override def nullSafeEval(t: Any): Any =
    CharEntropyStats.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tc => {
      s"""
         |${ev.value} = graft.functions.CharEntropyStats$$.MODULE$$.compute($tc);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("diversity_bits", LongType, nullable = false)))

  private def fl2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)

  def compute(t: UTF8String): InternalRow = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    java.util.Arrays.sort(cps)
    var mfl = 0L      // Σ m·⌊log2 m⌋ over equal-codepoint runs
    var distinct = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && cps(j) == cps(i)) j += 1
      val m = (j - i).toLong
      mfl += m * fl2(m)
      distinct += 1
      i = j
    }
    InternalRow(n.toLong, distinct, n.toLong * fl2(n.toLong) - mfl)
  }

  /** Column-level entry point. */
  def charEntropyStats(t: Column): Column =
    ColumnBridge.column(CharEntropyStats(ColumnBridge.expression(t)))
}

/** The whole Gopher repetition profile of one document in one pass:
  * `struct(den, top2, top3, top4, dup5)` — space-joined-token char
  * length, the char weight (count·len) of the most frequent word
  * {2,3,4}-gram (ties → smallest gram in CODE POINT order, matching
  * `min(struct(-cnt, gram))`'s UTF8String binary ordering, NOT Java's
  * UTF-16 compareTo), and the summed char weight of word 5-grams
  * occurring ≥ 2 times. Value-identical to
  * [[graft.operators.TextAnalysis.ngramRepetitionComposed]]'s
  * explode→count→pivot pipeline (NgramRepProfileSpec pins equality,
  * astral text included; the q_gopher_rep DuckDB oracle gates the
  * result) — but the ~4·|tokens| generated gram rows never exist:
  * each document folds its own counts in a per-row loop, so the
  * operator drops from two keyed exchanges to a pure projection.
  * Same preference-order (b) rationale as [[CharEntropyStats]].
  *
  * Null for documents with no nonempty tokens (den would be 0).
  */
case class NgramRepProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = NgramRepProfile.schema

  override def nullable: Boolean = true

  override def prettyName: String = "ngram_rep_profile"

  override def nullSafeEval(t: Any): Any =
    NgramRepProfile.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tc => {
      s"""
         |${ev.value} = graft.functions.NgramRepProfile$$.MODULE$$.compute($tc);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramRepProfile =
    copy(child = newChild)
}

object NgramRepProfile {

  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("den", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("top4", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false)))

  /** Code-point-order string compare — UTF8String binary order, which
    * is what the compositional form's `min(struct(-cnt, gram))` uses
    * (UTF-16 `String.compareTo` disagrees on astral-vs-high-BMP).
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Codepoint length — Spark's `length()` semantics. */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  // Return type must be the JVM-visible InternalRow, NOT Any: the
  // generated assignment `${ev.value} = ...compute(...)` targets an
  // InternalRow lvalue, and an Object-returning signature fails Janino
  // compilation — silently degrading the WHOLE enclosing projection/
  // predicate to interpreted mode (observed as "Expr codegen error and
  // falling back" on every q_gopher_rep consumer).
  def compute(t: UTF8String): InternalRow = {
    // UTF8String.toLowerCase IS Spark's lower() — locale-independent,
    // unlike bare String.toLowerCase; empties are filtered, so the
    // trim flavor cannot matter (tokens are maximal \S runs either way)
    val toks = t.toLowerCase.toString.split("\\s+")
      .filter(_.nonEmpty)
    if (toks.isEmpty) return null
    var den = (toks.length - 1).toLong
    var i = 0
    while (i < toks.length) { den += cpLen(toks(i)); i += 1 }
    val tops = new Array[Long](3) // n = 2, 3, 4
    var dup5 = 0L
    var n = 2
    while (n <= 5) {
      val counts = new java.util.HashMap[String, Long]()
      var g = 0
      val last = toks.length - n
      while (g <= last) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(g + j))
          j += 1
        }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        g += 1
      }
      if (n == 5) {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue >= 2L) dup5 += e.getValue * cpLen(e.getKey)
        }
      } else {
        var bestGram: String = null
        var bestCnt = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCnt ||
              (e.getValue == bestCnt && bestGram != null &&
                cpCompare(e.getKey, bestGram) < 0)) {
            bestGram = e.getKey
            bestCnt = e.getValue
          }
        }
        tops(n - 2) = if (bestGram == null) 0L else bestCnt * cpLen(bestGram)
      }
      n += 1
    }
    InternalRow(den, tops(0), tops(1), tops(2), dup5)
  }

  /** Column-level entry point. */
  def ngramRepProfile(t: Column): Column =
    ColumnBridge.column(NgramRepProfile(ColumnBridge.expression(t)))
}

/** 1-based codepoint positions i whose k-char window hash
  * `RollingHash(substring(t, i, k)) % p == 0` — the 0-mod-p window
  * selection of [[graft.operators.Dedup.exactSubstringPairs]] as one
  * TRUE Rabin-Karp pass: the window hash is rolled in O(1) per
  * position (subtract the leaving codepoint times 31^(k-1) mod M,
  * shift, add the entering codepoint) instead of re-folding k chars
  * per window, and only the ~n/p SELECTED positions are materialized —
  * the compositional `filter(transform(sequence(...)))` form pays
  * O(n·k) hash work plus a k-char substring allocation per position
  * BEFORE the filter. Value-identical to that form by modular
  * arithmetic (same (acc·31+cp) mod 1e9+7 fold; ZeroModWindowsSpec
  * pins bit-equality, astral codepoints included). Same
  * preference-order (b) rationale as [[RollingHash]] /
  * [[CharMinHashProfile]].
  */
case class ZeroModWindows(child: Expression, k: Int, p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "zero_mod_windows"

  override def nullSafeEval(t: Any): Any =
    ZeroModWindows.compute(t.asInstanceOf[UTF8String], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ZeroModWindows$$.MODULE$$.compute($c, $k, $p)")

  override protected def withNewChildInternal(newChild: Expression): ZeroModWindows =
    copy(child = newChild)
}

object ZeroModWindows {

  private val Mod = 1000000007L

  /** Empty array for texts shorter than k (no windows) — the analogue
    * of the compositional form's `length(t) >= k` guard.
    */
  def compute(t: UTF8String, k: Int, p: Int): ArrayData = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    var pow = 1L
    var j = 0
    while (j < k - 1) { pow = pow * 31L % Mod; j += 1 }
    var h = 0L
    j = 0
    while (j < k) { h = (h * 31L + cps(j)) % Mod; j += 1 }
    val buf = new scala.collection.mutable.ArrayBuffer[Any]
    if (h % p == 0) buf += 1
    var i = 1
    while (i < n) {
      var d = (h - cps(i - 1) * pow % Mod) % Mod
      if (d < 0) d += Mod
      h = (d * 31L + cps(i + k - 1)) % Mod
      if (h % p == 0) buf += (i + 1)
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Column-level entry point. */
  def zeroModWindows(t: Column, k: Int, p: Int): Column =
    ColumnBridge.column(ZeroModWindows(ColumnBridge.expression(t), k, p))
}

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * native scalar expression — the text-cleaning step every tokenizer
  * pipeline needs before dedup/hash keys: the SAME visible text can
  * arrive precomposed (é = U+00E9) or decomposed (e + U+0301), and
  * every hash-keyed operator in this library (exact dedup, MinHash,
  * fingerprints, line dedup) treats those as different documents unless
  * the corpus is normalized first.
  *
  * Spark has no normalization built-in, so this is preference-order (b)
  * — a codegen'd UnaryExpression over the JDK's `java.text.Normalizer`
  * (Unicode-conformant NFC, same UAX #15 algorithm DuckDB's
  * `nfc_normalize` implements, which is what makes the oracle an
  * independent cross-engine check). The `isNormalized` fast path makes
  * the overwhelmingly-ASCII common case a zero-allocation scan: NFC
  * quick-check on ASCII never rebuilds the string, so at 100 TB the
  * cost is one pass over the bytes for all but the rows that actually
  * need composing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_norm"

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Quick-check first (true for all-ASCII and already-composed text —
    * no allocation); rebuild only when composition actually applies.
    */
  def compute(t: UTF8String): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def nfcNorm(t: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(t)))
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm): over the text's k-char window
  * hashes, slide a window of `w` consecutive positions and select the
  * RIGHTMOST minimal hash in each; the distinct selected (position,
  * hash) pairs are the document's fingerprints. Unlike the 0-mod-p
  * selection of [[ZeroModWindows]] (expected density 1/p but
  * unbounded gaps), winnowing GUARANTEES both a density bound
  * (2/(w+1) expected) and the matching theorem: any shared substring
  * of length ≥ w + k − 1 contributes at least one IDENTICAL
  * fingerprint to both documents — the recall contract a dedup
  * pipeline can state without probabilistic hedging.
  *
  * The hash is deliberately MOD-FREE so an oracle can replay it in
  * plain integer SQL: h(i) = Σ_{j<k} cp(i+j)·31^(k−1−j), computed
  * rolled in O(1)/position. With k ≤ 8 and codepoints ≤ 0x10FFFF the
  * sum is < 3.2·10¹⁶ — int64-exact on every engine (hence the k ≤ 8
  * guard). Selection is the classic monotone-deque sliding minimum
  * (`>=` pops make ties resolve to the rightmost), O(n) total, one
  * allocation for the selected pairs only — texts shorter than
  * w + k − 1 chars have no full window and fingerprint to the empty
  * array. Preference-order (b): the compositional form would pay an
  * O(n·w) HOF scan plus per-position struct allocation before any
  * selection.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(t: Any): Any =
    WinnowFingerprints.compute(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints$$.MODULE$$.compute($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {

  /** 1-based positions; empty array when no full window exists. */
  def compute(t: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && k <= 8, "k-gram hash is int64-exact only for k <= 8")
    require(w >= 1, "window must be positive")
    val cps = t.toString.codePoints().toArray
    val p = cps.length - (k - 1)
    if (p < w) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](p)
    var topPow = 1L
    var j = 0
    while (j < k - 1) { topPow *= 31L; j += 1 }
    var acc = 0L
    j = 0
    while (j < k) { acc = acc * 31L + cps(j); j += 1 }
    h(0) = acc
    var i = 1
    while (i < p) {
      acc = (acc - cps(i - 1) * topPow) * 31L + cps(i + k - 1)
      h(i) = acc
      i += 1
    }
    val deque = new java.util.ArrayDeque[Integer]()
    val buf = new scala.collection.mutable.ArrayBuffer[Any]
    var lastSel = -1
    i = 0
    while (i < p) {
      while (!deque.isEmpty && h(deque.peekLast) >= h(i)) deque.pollLast()
      deque.addLast(i)
      val wstart = i - w + 1
      if (wstart >= 0) {
        while (deque.peekFirst < wstart) deque.pollFirst()
        val sel = deque.peekFirst
        if (sel != lastSel) {
          buf += InternalRow(sel + 1, h(sel))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Column-level entry point. */
  def winnowFingerprints(t: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(t), k, w))
}

/** Multi-pattern blocklist matcher (Aho, Corasick, CACM'75): counts
  * EVERY occurrence (overlapping included) of each phrase in one O(n)
  * pass over the text, returning one count per phrase in input order.
  * The content-policy filter of a pretraining pipeline — thousands of
  * blocked phrases screened per document — is exactly the workload the
  * automaton exists for: k separate `contains`/regex passes cost
  * O(n·k) scans of a 100 TB corpus, the automaton costs the one scan
  * regardless of how many phrases ride it.
  *
  * The automaton is built ONCE at plan time from the phrase list and
  * shipped to executors via Catalyst's reference-object mechanism
  * (`addReferenceObj`), so codegen stays a single virtual call per row
  * — no per-row or per-task construction. Matching is by exact UTF-16
  * char sequence (callers fold case with `lower()` upstream if
  * case-insensitive semantics are wanted). Dictionary-suffix output
  * links are pre-merged per state at build time, so emitting a match
  * never re-walks the failure chain.
  *
  * Preference-order (b): the compositional form is k regexp scans (and
  * Spark's regexp cannot count overlapping matches at all).
  */
case class BlocklistHits(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "phrases must be a non-empty list of non-empty strings")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "blocklist_hits"

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override def nullSafeEval(t: Any): Any =
    ac.hits(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, "graft.functions.AhoCorasick")
    defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

/** The compiled automaton: goto tables, failure links, and per-state
  * pre-merged output pattern ids. Serializable so plan shipping and
  * `addReferenceObj` both work.
  */
final class AhoCorasick private (
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    outputs: Array[Array[Int]],
    val numPatterns: Int) extends Serializable {

  /** One pass; counts[i] = total end positions of phrase i in t. */
  def hits(t: UTF8String): ArrayData = {
    val s = t.toString
    val counts = new Array[Long](numPatterns)
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = Character.valueOf(s.charAt(i))
      var next = gotoMaps(state).get(c)
      while (next == null && state != 0) {
        state = fail(state)
        next = gotoMaps(state).get(c)
      }
      state = if (next == null) 0 else next.intValue()
      val out = outputs(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts.map(x => x: Any))
  }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    val gotos = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var state = 0
      p.foreach { ch =>
        val c = Character.valueOf(ch)
        val nxt = gotos(state).get(c)
        if (nxt == null) {
          gotos += new java.util.HashMap[Character, Integer]()
          ownOut += Nil
          gotos(state).put(c, gotos.size - 1)
          state = gotos.size - 1
        } else state = nxt.intValue()
      }
      ownOut(state) = pid :: ownOut(state)
    }
    val n = gotos.size
    val fail = new Array[Int](n)
    val merged = new Array[List[Int]](n)
    var i = 0
    while (i < n) { merged(i) = ownOut(i); i += 1 }
    val queue = new java.util.ArrayDeque[Integer]()
    gotos(0).forEach((_, s) => queue.add(s))
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotos(u).forEach { (c, v) =>
        var f = fail(u)
        var nxt = gotos(f).get(c)
        while (nxt == null && f != 0) { f = fail(f); nxt = gotos(f).get(c) }
        fail(v) = if (nxt == null || nxt == v) 0 else nxt.intValue()
        merged(v) = merged(v) ++ merged(fail(v))
        queue.add(v)
      }
    }
    new AhoCorasick(gotos.toArray, fail, merged.map(_.sorted.toArray),
      patterns.size)
  }

  /** Column-level entry point. */
  def blocklistHits(t: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(BlocklistHits(ColumnBridge.expression(t), phrases))
}

/** Greedy extractive-fragment statistics (Grusky et al. NAACL'18, the
  * Newsroom coverage/density measure): scan the summary left to right;
  * at each position take the LONGEST contiguous token run that appears
  * anywhere in the article, advance past it (or one token on a miss).
  * Returns `array<bigint> [matched_tokens, Σ len², n_fragments,
  * n_summary]` — coverage = matched/n, density = Σlen²/n, both left
  * undivided for the caller (engine-exact integers).
  *
  * Why a native expression (preference order (b)): the greedy
  * recurrence is inherently sequential per row — no `aggregate`/
  * `transform` composition expresses "advance i by the match length
  * just found" without materializing an O(|S|·|A|) match table per
  * row, and HOFs are CodegenFallback anyway. Here it is one bounded
  * two-level loop per row inside whole-stage codegen (the kernel is a
  * plan-shipped singleton, one virtual call per row). Callers bound
  * both sides (slice() before the call) so the worst case is a
  * constant; at 100 TB the cost model is scan-speed × that constant,
  * zero exchanges.
  *
  * NULL contract: null on either null input (BinaryExpression default);
  * empty summary → [0, 0, 0, 0].
  */
case class ExtractiveFragments(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "extractive_fragments"

  override def nullSafeEval(a: Any, s: Any): Any =
    EfKernel.compute(a.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("efk", EfKernel, "graft.functions.EfKernel$")
    defineCodeGen(ctx, ev, (a, s) => s"$k.compute($a, $s)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The greedy-matching kernel of [[ExtractiveFragments]] — a
  * serializable singleton so `addReferenceObj` ships it into generated
  * code and streaming tasks alike.
  */
object EfKernel extends Serializable {
  def compute(artD: ArrayData, summD: ArrayData): ArrayData = {
    val na = artD.numElements()
    val ns = summD.numElements()
    val art = new Array[UTF8String](na)
    val summ = new Array[UTF8String](ns)
    var j = 0
    while (j < na) { art(j) = artD.getUTF8String(j); j += 1 }
    j = 0
    while (j < ns) { summ(j) = summD.getUTF8String(j); j += 1 }

    var i = 0
    var matched = 0L
    var sq = 0L
    var frags = 0L
    while (i < ns) {
      var best = 0
      var a = 0
      while (a < na) {
        // only walk a run if its head matches (the O(1) reject path)
        if (summ(i).equals(art(a))) {
          var l = 1
          while (i + l < ns && a + l < na && summ(i + l).equals(art(a + l))) l += 1
          if (l > best) best = l
        }
        a += 1
      }
      if (best > 0) {
        matched += best
        sq += best.toLong * best
        frags += 1L
        i += best
      } else i += 1
    }
    new GenericArrayData(Array[Any](matched, sq, frags, ns.toLong))
  }

  /** Column-level entry point: article tokens, summary tokens. */
  def extractiveFragments(article: Column, summary: Column): Column =
    ColumnBridge.column(ExtractiveFragments(ColumnBridge.expression(article),
      ColumnBridge.expression(summary)))
}
