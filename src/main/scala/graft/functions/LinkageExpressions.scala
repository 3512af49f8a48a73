package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity over two strings — the record-linkage
  * scoring primitive (fuzzy name/address matching after blocking).
  *
  * Bit-identical to DuckDB's `jaro_winkler_similarity` (the oracle),
  * pinned empirically over 6k adversarial pairs incl. shared-prefix and
  * non-ASCII cases:
  *  - operates on the raw UTF-8 BYTES of each string (DuckDB's
  *    rapidfuzz-derived implementation is byte-based, not
  *    codepoint-based — 'héllo'/'hello' scores as 6-vs-5 byte strings);
  *  - either side empty → 0.0 (including both empty);
  *  - Jaro: match window max(|a|,|b|)/2 − 1 (floored at 0), greedy
  *    left-to-right matching, transpositions halved, then
  *    (m/|a| + m/|b| + (m−t)/m) / 3 in exactly that IEEE op order;
  *  - Winkler boost only when jaro > 0.7: sim += l·0.1·(1−sim) with l =
  *    common byte prefix capped at 4.
  *
  * Bit-equality is what makes downstream argmax/threshold queries
  * cross-engine deterministic: best-match ties and threshold cuts
  * resolve identically on both engines because the doubles are equal,
  * not merely close. Preference-order (b): per-pair scratch is two
  * boolean arrays; the composition equivalent would be a per-row UDF
  * (no built-in expresses the matching window).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Blocked-linkage argmax kernel: scan a (broadcast) candidate list
  * `array<struct<id bigint, name string>>` and return the single best
  * Jaro-Winkler match as `struct<match_id bigint, match_sim double>`,
  * excluding the probing record itself (`selfId`); ties go to the
  * highest id; NULL when no other candidate exists.
  *
  * This replaces the join-explode-aggregate formulation of best-match
  * (|block|² intermediate rows through an ObjectHashAggregate whose
  * per-partition group count trips the sort-based fallback) with ONE
  * output row per record: the block scan runs inside the expression,
  * so the plan is scan → broadcast-join the per-block lists → project.
  * Measured at sf0.1: 9.6 s → sub-second for the same result set.
  * CodegenFallback is deliberate: row count equals |records| (not
  * |pairs|), so per-row boxing is noise while the inner loop is
  * compiled Scala either way. Precondition: block lists fit in the
  * broadcast — the same bounded-block discipline every all-pairs
  * blocking scheme already requires (see operators/Linkage scaladoc).
  */
case class JwBestMatch(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("match_id", LongType, nullable = false),
    StructField("match_sim", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "jw_best_match"

  override protected def nullSafeEval(name: Any, selfId: Any,
                                      cands: Any): Any = {
    val nameBytes = name.asInstanceOf[UTF8String].getBytes
    val self = selfId.asInstanceOf[Long]
    val arr = cands.asInstanceOf[ArrayData]
    var bestSim = -1.0
    var bestId = Long.MinValue
    var found = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        // NULL id or name: never a candidate (getLong on a null slot
        // would read 0 and fabricate matches against record id 0)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cid = row.getLong(0)
          if (cid != self) {
            val sim = JaroWinkler.computeBytes(nameBytes,
              row.getUTF8String(1).getBytes)
            if (!found || sim > bestSim || (sim == bestSim && cid > bestId)) {
              bestSim = sim; bestId = cid; found = true
            }
          }
        }
      }
      i += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestId, bestSim))
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JwBestMatch =
    copy(first = f, second = s, third = t)
}

object JwBestMatch {
  def of(name: Column, selfId: Column, cands: Column): Column =
    ColumnBridge.column(JwBestMatch(ColumnBridge.expression(name),
      ColumnBridge.expression(selfId), ColumnBridge.expression(cands)))
}

/** Blocked-linkage threshold kernel: all candidates with id > selfId
  * (the undirected a<b form) scoring at or above the threshold, as
  * `array<struct<b_id bigint, sim double>>` — explode it for the pair
  * rows. Same broadcast-scan shape and precondition as [[JwBestMatch]];
  * each undirected pair is scored exactly ONCE (the join-based form
  * re-evaluates the similarity in both the filter and the project).
  */
case class JwMatches(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "jw_matches"

  override protected def nullSafeEval(name: Any, selfId: Any, cands: Any,
                                      thr: Any): Any = {
    val nameBytes = name.asInstanceOf[UTF8String].getBytes
    val self = selfId.asInstanceOf[Long]
    val threshold = thr.asInstanceOf[Double]
    val arr = cands.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        // NULL id or name: never a candidate (same guard as JwBestMatch)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cid = row.getLong(0)
          if (cid > self) {
            val sim = JaroWinkler.computeBytes(nameBytes,
              row.getUTF8String(1).getBytes)
            if (sim >= threshold)
              out += new GenericInternalRow(Array[Any](cid, sim))
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): JwMatches =
    copy(first = f, second = s, third = t, fourth = q)
}

object JwMatches {
  def of(name: Column, selfId: Column, cands: Column, thr: Column): Column =
    ColumnBridge.column(JwMatches(ColumnBridge.expression(name),
      ColumnBridge.expression(selfId), ColumnBridge.expression(cands),
      ColumnBridge.expression(thr)))
}

object JaroWinkler {

  def of(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def compute(a: UTF8String, b: UTF8String): Double =
    computeBytes(a.getBytes, b.getBytes)

  def computeBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val pmax = math.min(4, math.min(l1, l2))
      var pl = 0
      while (pl < pmax && s1(pl) == s2(pl)) pl += 1
      sim += pl * 0.1 * (1.0 - sim)
    }
    sim
  }
}
