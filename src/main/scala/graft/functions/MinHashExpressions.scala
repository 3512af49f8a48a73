package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-k-gram minhash PROFILE in one pass:
  * `struct(mins: array<string>, sh_set: array<long>)` where
  * `mins(h) = min over positions g of
  *   substring(md5((h div 4) ‖ '|' ‖ substring(t, g, k)), (h%4)·8+1, 8)`
  * (the repo's salted-md5 hash family — one digest yields four 8-hex
  * windows) and `sh_set` is the distinct `xxhash64(shingle)` set.
  *
  * Byte-identical to [[graft.operators.Dedup.dedupProfiles]] over
  * [[graft.operators.Dedup.rawCharShingles]] — MinHashProfileSpec pins
  * exact equality, and q_ngram_jaccard's unchanged DuckDB oracle gates
  * the composed result — but the |text| positions per document stay in
  * ONE loop instead of exploding into |text| rows that each pay
  * expression-tree evaluation and hash-aggregate machinery. At sf0.1
  * that explode materializes ~10M rows; at 100 TB it's the dominant
  * allocation cost of the LSH pipeline. Same preference-order (b)
  * rationale as [[DotProduct]] and [[MinTicketKey]].
  */
case class CharMinHashProfile(child: Expression, k: Int, numDigests: Int)
    extends UnaryExpression {

  override def dataType: DataType = CharMinHashProfile.schema

  override def nullable: Boolean = true

  override def prettyName: String = "char_minhash_profile"

  override def nullSafeEval(t: Any): Any =
    CharMinHashProfile.compute(t.asInstanceOf[UTF8String], k, numDigests)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tc => {
      s"""
         |${ev.value} = graft.functions.CharMinHashProfile$$.MODULE$$.compute(
         |  $tc, $k, $numDigests);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharMinHashProfile =
    copy(child = newChild)
}

object CharMinHashProfile {

  val schema: StructType = StructType(Seq(
    StructField("mins", ArrayType(StringType, containsNull = false)),
    StructField("sh_set", ArrayType(LongType, containsNull = false))))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Null for texts shorter than k (no shingles — matches the
    * `length(t) >= k` filter of the compositional form). Shingling is
    * by Unicode CODE POINT, exactly like Spark's `length`/`substring`
    * (and DuckDB's) — not UTF-16 units, so surrogate-pair text cannot
    * diverge from the compositional form.
    */
  def compute(t: UTF8String, k: Int, numDigests: Int): InternalRow = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length - (k - 1)
    if (n <= 0) return null
    computeFrom(n, g => new String(cps, g, k), numDigests)
  }

  /** The hash loop shared by the char-gram and word-gram profile
    * expressions: for shingles 0..count-1 (produced by `shingleAt`),
    * fold the salted-md5 window minima and the distinct-xxhash64 set —
    * exactly the aggregate of [[graft.operators.Dedup.dedupProfiles]],
    * one document per call.
    */
  private[functions] def computeFrom(count: Int, shingleAt: Int => String,
                                     numDigests: Int): InternalRow = {
    val md = MessageDigest.getInstance("MD5")
    val numHashes = numDigests * 4
    val mins = new Array[String](numHashes)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var g = 0
    while (g < count) {
      val shingle = shingleAt(g)
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(shingle), StringType, 42L))
      var d = 0
      while (d < numDigests) {
        md.reset()
        val digest = md.digest((d.toString + "|" + shingle).getBytes(UTF_8))
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < 16) {
          sb.append(hexDigits((digest(i) >> 4) & 0xf))
          sb.append(hexDigits(digest(i) & 0xf))
          i += 1
        }
        val hex = sb.toString
        var w = 0
        while (w < 4) {
          val h = d * 4 + w
          val win = hex.substring(w * 8, w * 8 + 8)
          if (mins(h) == null || win.compareTo(mins(h)) < 0) mins(h) = win
          w += 1
        }
        d += 1
      }
      g += 1
    }
    val minData: ArrayData =
      new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
    val it = seen.iterator()
    val setArr = new Array[Any](seen.size())
    var i = 0
    while (it.hasNext) { setArr(i) = it.next().longValue(); i += 1 }
    InternalRow(minData, new GenericArrayData(setArr))
  }

  /** Column-level entry point. */
  def charMinHashProfile(t: Column, k: Int, numDigests: Int): Column =
    ColumnBridge.column(
      CharMinHashProfile(ColumnBridge.expression(t), k, numDigests))
}

/** Per-document WORD-n-gram minhash profile in one pass — the word-
  * shingle twin of [[CharMinHashProfile]], same output struct and the
  * same hash family. The input must already be `lower(trim(text))`
  * (applied with Spark's own expressions in
  * [[graft.operators.Dedup.wordDedupProfiles]], exactly like the char
  * variant pre-lowers — no reimplementation of collation-sensitive
  * lowering here); this expression only tokenizes, replicating
  * `split(col, "\\s+")` as Java-regex split with limit -1 — including
  * its leading-empty-token behavior on tab-led text — so
  * WordMinHashProfileSpec can pin bit-equality against
  * `dedupProfiles(rawWordShingles(…))` and every dedup oracle stays
  * unchanged. Shingle = n consecutive tokens joined by a single space
  * (= `concat_ws(" ", …)` over non-null tokens); documents with fewer
  * than n tokens profile to null (the compositional `size(toks) >= n`
  * drop). Replaces the per-document |tokens|-row explode +
  * hash-aggregate of the LSH pipeline with one codegen'd projection
  * loop — at sf0.1 that explode is ~2M rows across seven catalog
  * queries; at 100 TB it is the dominant allocation cost.
  */
case class WordMinHashProfile(child: Expression, n: Int, numDigests: Int)
    extends UnaryExpression {

  override def dataType: DataType = CharMinHashProfile.schema

  override def nullable: Boolean = true

  override def prettyName: String = "word_minhash_profile"

  override def nullSafeEval(t: Any): Any =
    WordMinHashProfile.compute(t.asInstanceOf[UTF8String], n, numDigests)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tc => {
      s"""
         |${ev.value} = graft.functions.WordMinHashProfile$$.MODULE$$.compute(
         |  $tc, $n, $numDigests);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordMinHashProfile =
    copy(child = newChild)
}

object WordMinHashProfile {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Null for documents with fewer than n tokens (no shingles). */
  def compute(t: UTF8String, n: Int, numDigests: Int): InternalRow = {
    val toks = ws.split(t.toString, -1)
    val count = toks.length - (n - 1)
    if (count <= 0) return null
    CharMinHashProfile.computeFrom(count, { g =>
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      sb.toString
    }, numDigests)
  }

  /** Column-level entry point. */
  def wordMinHashProfile(t: Column, n: Int, numDigests: Int): Column =
    ColumnBridge.column(
      WordMinHashProfile(ColumnBridge.expression(t), n, numDigests))
}
