package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native dot product over two array<double> columns.
  *
  * Semantics are exactly the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`:
  * a left fold in index order starting at 0.0 for equal-length arrays,
  * and NULL for unequal lengths (zip_with pads the shorter side with
  * nulls, which poison the sum) — so results are bit-identical to the
  * interpreted HOF (and to a DuckDB `list_reduce` oracle), while
  * doGenCode emits a tight primitive loop instead of allocating a
  * zipped intermediate array and evaluating two lambdas per element
  * per row. A mismatched pair surfaces as NULL, never as a
  * plausible-looking partial dot product.
  *
  * This is the preference-order (b) case of SURVEY.md §7.3: a custom
  * Expression where the built-in composition is semantically right but
  * allocates per element on the hot path (similarity search evaluates
  * this |queries|×|corpus| times).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    if (xs.length != ys.length) return null
    var acc = 0.0
    var i = 0
    while (i < xs.length) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |if ($xs.length != $ys.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $xs.length; $i++) { $acc += $xs[$i] * $ys[$i]; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[DotProduct]]: dot product over two array<bigint>
  * columns, as a codegen'd primitive loop. Same semantics as the HOF
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` —
  * index-order left fold from 0, NULL on length mismatch — but without
  * the per-row zipped-array allocation and per-element interpreted
  * lambda evals, which dominate the quantized-embedding verify loops
  * ([[graft.operators.Similarity.semanticDedup]] evaluates this once
  * per candidate PAIR). Integer overflow wraps exactly like Spark's
  * (and DuckDB's BIGINT) `*`/`+` under non-ANSI long arithmetic; callers
  * quantize so products stay far inside int64 (documented per call
  * site), so wraps never occur in practice.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    if (xs.length != ys.length) return null
    var acc = 0L
    var i = 0
    while (i < xs.length) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |if ($xs.length != $ys.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $xs.length; $i++) { $acc += $xs[$i] * $ys[$i]; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}


/** Squared-L2 sibling of [[LongDotProduct]]: sum (x-y)^2 over two
  * array<bigint> columns as one codegen'd primitive loop. Same
  * semantics as the HOF `aggregate(zip_with(a, b, (x,y) ->
  * (x-y)*(x-y)), 0L, (acc,v) -> acc+v)` — NULL on length mismatch —
  * minus the zipped-array allocation and interpreted lambda per pair,
  * which dominate [[graft.operators.Similarity.knnDensity]]'s
  * corpus x sample distance passes (one eval per PAIR). Callers
  * quantize so (x-y)^2 sums stay far inside int64.
  */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_sqdist_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    if (xs.length != ys.length) return null
    var acc = 0L
    var i = 0
    while (i < xs.length) {
      val d = xs(i) - ys(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |if ($xs.length != $ys.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $xs.length; $i++) {
         |    long $d = $xs[$i] - $ys[$i];
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment as ONE per-row expression — the IVF /
  * coarse-quantizer inner loop (`argmax_i dot(v, c_i) / (|v|·|c_i|)`,
  * ties to the lowest centroid id) over a centroid array carried as a
  * scalar-broadcast column.
  *
  * Why this exists when `crossJoin(broadcast(cents)) → max(struct)`
  * computes the same thing: that composition MATERIALIZES |corpus|×
  * nlist joined rows and funnels them through an aggregate exchange
  * just to keep one row per vector, then needs a corpus-keyed
  * self-join to refetch the vector it threw away — at the r12
  * simsearch sweep's 10M×198 point that is 2B intermediate rows for
  * 10M results. This expression walks the (id-ascending) centroid
  * array inside whole-stage codegen: zero extra rows, zero exchanges,
  * the vector column never leaves the row.
  *
  * Parity contract with the join+aggregate form (gated by q_knn_ivf's
  * oracle): `cents` must be sorted ascending by id (sort_array on the
  * collected struct does this); each score is computed with the
  * identical IEEE op order `dot / (cnorm * centnorm)` with dot the
  * same index-order fold as [[DotProduct]]; comparisons use
  * Double.compare — Spark's total order for doubles (NaN greatest,
  * -0 < 0) — with strict `>`, so on exact ties the FIRST (lowest-id)
  * centroid wins, exactly max(struct(csim, -id)). A centroid whose
  * vector length mismatches is skipped (the join form's NULL csim
  * likewise never wins a max against any non-null struct); if every
  * centroid is skipped or the array is empty the result is NULL.
  */
case class NearestCentroid(vec: Expression, cnorm: Expression,
    cents: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cnorm
  override def third: Expression = cents

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any, n: Any, cs: Any): Any = {
    val xs = v.asInstanceOf[ArrayData].toDoubleArray()
    val norm = n.asInstanceOf[Double]
    val arr = cs.asInstanceOf[ArrayData]
    var bestId = 0L
    var best = 0.0
    var found = false
    var i = 0
    while (i < arr.numElements()) {
      val c = if (arr.isNullAt(i)) null else arr.getStruct(i, 3)
      // null-field guard: a null vector/norm inside a collected struct
      // must be SKIPPED (the composition's null score never wins a
      // max/min), not NPE on numElements()
      val cv = if (c == null || c.isNullAt(1)) null else c.getArray(1)
      if (cv != null && !c.isNullAt(0) && !c.isNullAt(2) &&
          cv.numElements() == xs.length) {
        var acc = 0.0
        var j = 0
        while (j < xs.length) { acc += xs(j) * cv.getDouble(j); j += 1 }
        val s = acc / (norm * c.getDouble(2))
        if (!found || java.lang.Double.compare(s, best) > 0) {
          found = true; best = s; bestId = c.getLong(0)
        }
      }
      i += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, cs) => {
      val xs = ctx.freshName("xs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found")
      s"""
         |double[] $xs = $v.toDoubleArray();
         |double $best = 0.0;
         |long $bestId = 0L;
         |boolean $found = false;
         |for (int $i = 0; $i < $cs.numElements(); $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $c =
         |    $cs.isNullAt($i) ? null : $cs.getStruct($i, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |    ($c == null || $c.isNullAt(1)) ? null : $c.getArray(1);
         |  if ($cv != null && !$c.isNullAt(0) && !$c.isNullAt(2)
         |      && $cv.numElements() == $xs.length) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $xs.length; $j++) {
         |      $acc += $xs[$j] * $cv.getDouble($j);
         |    }
         |    double $s = $acc / ($n * $c.getDouble(2));
         |    if (!$found || java.lang.Double.compare($s, $best) > 0) {
         |      $found = true; $best = $s; $bestId = $c.getLong(0);
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, cnorm = newSecond, cents = newThird)
}

/** Integer twin of [[NearestCentroid]] for the quantized k-means
  * assignment ([[graft.operators.Similarity.cellAssignments]]):
  * `argmin_i (nc_i − 2·dot(q, qc_i))` over array<bigint> vectors —
  * the squared-L2 order with the constant |q|² term dropped — ties to
  * the lowest cell id. All-integer arithmetic, so parity with the
  * crossJoin → min(struct(dist, cid)) composition is exact by
  * construction (no IEEE ordering subtleties); `cells` must be sorted
  * ascending by cid and strict `<` keeps the first (lowest) cid on
  * ties, exactly min(struct). Mismatched-length cells are skipped;
  * empty/all-skipped yields NULL. Same motivation as the double form:
  * the composition materializes |corpus|×cells rows plus an argmin
  * exchange; this is a projection.
  */
case class NearestCellLong(vec: Expression, cells: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cells

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_cell_long"

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val xs = v.asInstanceOf[ArrayData].toLongArray()
    val arr = cs.asInstanceOf[ArrayData]
    var bestId = 0L
    var best = 0L
    var found = false
    var i = 0
    while (i < arr.numElements()) {
      val c = if (arr.isNullAt(i)) null else arr.getStruct(i, 3)
      // null-field guard: a null vector/norm inside a collected struct
      // must be SKIPPED (the composition's null score never wins a
      // max/min), not NPE on numElements()
      val cv = if (c == null || c.isNullAt(1)) null else c.getArray(1)
      if (cv != null && !c.isNullAt(0) && !c.isNullAt(2) &&
          cv.numElements() == xs.length) {
        var acc = 0L
        var j = 0
        while (j < xs.length) { acc += xs(j) * cv.getLong(j); j += 1 }
        val d = c.getLong(2) - 2L * acc
        if (!found || d < best) { found = true; best = d; bestId = c.getLong(0) }
      }
      i += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val xs = ctx.freshName("xs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found")
      s"""
         |long[] $xs = $v.toLongArray();
         |long $best = 0L;
         |long $bestId = 0L;
         |boolean $found = false;
         |for (int $i = 0; $i < $cs.numElements(); $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $c =
         |    $cs.isNullAt($i) ? null : $cs.getStruct($i, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |    ($c == null || $c.isNullAt(1)) ? null : $c.getArray(1);
         |  if ($cv != null && !$c.isNullAt(0) && !$c.isNullAt(2)
         |      && $cv.numElements() == $xs.length) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $xs.length; $j++) {
         |      $acc += $xs[$j] * $cv.getLong($j);
         |    }
         |    long $d = $c.getLong(2) - 2L * $acc;
         |    if (!$found || $d < $best) {
         |      $found = true; $best = $d; $bestId = $c.getLong(0);
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(vec = newLeft, cells = newRight)
}

/** Product-quantization encode as ONE per-row expression: split the
  * array<bigint> vector into `m` contiguous subvectors of
  * `size div m` elements (trailing remainder ignored — the slice
  * composition's `size(qe) div m` contract) and emit, per subspace,
  * the id of the centroid minimizing exact integer squared-L2 over
  * that subspace, ties to the lowest cid (`cents` sorted ascending,
  * strict `<` — the min(struct(dist, cid)) rule). Output
  * array<bigint> of length m, position = subspace.
  *
  * Replaces the `crossJoin(broadcast(cents)) → explode(m subspaces) →
  * min(struct) per (id, s)` composition, which materialized
  * |corpus|×nCent×m rows plus an aggregate exchange (4096× at a
  * production m=16/nCent=256) to produce m codes per vector. Integer
  * arithmetic end to end, so parity with the composition is exact.
  * Centroids whose length mismatches the vector are skipped; if none
  * qualify the result is NULL (the composition's null-distance
  * behavior there is a same-table impossibility either way).
  */
case class PqEncode(vec: Expression, cents: Expression, m: Int)
    extends BinaryExpression {

  require(m > 0, s"pq_encode needs m > 0, got $m")

  override def left: Expression = vec
  override def right: Expression = cents

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val xs = v.asInstanceOf[ArrayData].toLongArray()
    val arr = cs.asInstanceOf[ArrayData]
    val sub = xs.length / m
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = 0L
      var bestId = 0L
      var found = false
      var i = 0
      while (i < arr.numElements()) {
        val c = if (arr.isNullAt(i)) null else arr.getStruct(i, 2)
        val cv = if (c == null || c.isNullAt(1)) null else c.getArray(1)
        if (cv != null && !c.isNullAt(0) && cv.numElements() == xs.length) {
          var d = 0L
          var j = s * sub
          val end = j + sub
          while (j < end) {
            val diff = xs(j) - cv.getLong(j); d += diff * diff; j += 1
          }
          if (!found || d < best) { found = true; best = d; bestId = c.getLong(0) }
        }
        i += 1
      }
      if (!found) return null
      codes(s) = bestId
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val xs = ctx.freshName("xs")
      val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found")
      s"""
         |long[] $xs = $v.toLongArray();
         |int $sub = $xs.length / $m;
         |long[] $codes = new long[$m];
         |for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |  long $best = 0L;
         |  long $bestId = 0L;
         |  boolean $found = false;
         |  for (int $i = 0; $i < $cs.numElements(); $i++) {
         |    org.apache.spark.sql.catalyst.InternalRow $c =
         |      $cs.isNullAt($i) ? null : $cs.getStruct($i, 2);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      ($c == null || $c.isNullAt(1)) ? null : $c.getArray(1);
         |    if ($cv != null && !$c.isNullAt(0) && $cv.numElements() == $xs.length) {
         |      long $d = 0L;
         |      int $end = $s * $sub + $sub;
         |      for (int $j = $s * $sub; $j < $end; $j++) {
         |        long $diff = $xs[$j] - $cv.getLong($j); $d += $diff * $diff;
         |      }
         |      if (!$found || $d < $best) {
         |        $found = true; $best = $d; $bestId = $c.getLong(0);
         |      }
         |    }
         |  }
         |  if ($found) { $codes[$s] = $bestId; } else { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(vec = newLeft, cents = newRight)
}

/** Fused cosine top-k over an inverted-list row — the hot kernel of
  * `Similarity.ivfProbeStream`: for one query (qv, qnorm, selfId)
  * against one list (array<struct<cand_id, cv, cnorm>>), score every
  * candidate `dot(qv, cv) / (qnorm · cnorm)` and keep the k best by
  * (sim desc, cand_id asc) in a primitive bounded heap, emitted SORTED
  * as array<struct<sim, cand_id>>.
  *
  * Why fused: the composition — transform(list, struct(vec_dot/…)) →
  * filter(self, null) → StructArrayTopK — is semantically identical
  * but pays the HOF machinery per CANDIDATE (lambda binding, struct
  * allocation, two intermediate arrays per row); measured on the ann
  * stream topology at ~2.5k candidates/query: 262 rows/s as
  * array_sort-with-comparator, 1,842 rows/s as heap-over-HOF, and the
  * fused kernel removes the remaining per-candidate allocations. Same
  * preference-order (b) argument as [[DotProduct]]/[[NearestCentroid]].
  *
  * Parity contract (pinned by AnnStreamSpec against the batch window
  * form): sim is the identical IEEE sequence (sequential-fold dot,
  * then one divide by the qnorm·cnorm product); doubles order by
  * java.lang.Double.compare (NaN greatest → first under desc, exactly
  * like a desc("sim") window sort); candidates with a null/mismatched
  * cv, null cand_id/cnorm, or cand_id = selfId are skipped (the
  * documented heap-form NULL exclusion). A null list yields NULL (the
  * probe-slot left-join miss), which callers drop before merging.
  * cand_id compares via its type's interpreted ordering, so any
  * orderable id type works.
  */
case class CosineTopK(qv: Expression, qnorm: Expression, selfId: Expression,
    list: Expression, k: Int)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def first: Expression = qv
  override def second: Expression = qnorm
  override def third: Expression = selfId
  override def fourth: Expression = list

  private lazy val idType: DataType = list.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields(0).dataType

  private lazy val idOrd: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(idType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType, nullable = false),
      StructField("cand_id", idType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_topk"

  // rank order: negative when (sa, ia) ranks BEFORE (sb, ib)
  private def rankCmp(sa: Double, ia: Any, sb: Double, ib: Any): Int = {
    val c = -java.lang.Double.compare(sa, sb)
    if (c != 0) c else idOrd.compare(ia, ib)
  }

  override protected def nullSafeEval(v: Any, n: Any, self: Any, l: Any): Any = {
    val xs = v.asInstanceOf[ArrayData].toDoubleArray()
    val qn = n.asInstanceOf[Double]
    val arr = l.asInstanceOf[ArrayData]
    // max-heap on rankCmp (root = currently-WORST survivor), primitive
    // parallel arrays — no per-candidate allocation on the reject path
    val sims = new Array[Double](k)
    val ids = new Array[Any](k)
    var size = 0
    def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && rankCmp(sims(i), ids(i), sims((i - 1) / 2), ids((i - 1) / 2)) > 0) {
        val p = (i - 1) / 2
        val ts = sims(i); val ti = ids(i)
        sims(i) = sims(p); ids(i) = ids(p)
        sims(p) = ts; ids(p) = ti
        i = p
      }
    }
    def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val lc = 2 * i + 1
        val rc = lc + 1
        var m = i
        if (lc < size && rankCmp(sims(lc), ids(lc), sims(m), ids(m)) > 0) m = lc
        if (rc < size && rankCmp(sims(rc), ids(rc), sims(m), ids(m)) > 0) m = rc
        if (m == i) done = true
        else {
          val ts = sims(i); val ti = ids(i)
          sims(i) = sims(m); ids(i) = ids(m)
          sims(m) = ts; ids(m) = ti
          i = m
        }
      }
    }
    val total = arr.numElements()
    var i = 0
    while (i < total) {
      val c = if (arr.isNullAt(i)) null else arr.getStruct(i, 3)
      val cv = if (c == null || c.isNullAt(1)) null else c.getArray(1)
      if (cv != null && !c.isNullAt(0) && !c.isNullAt(2) &&
          cv.numElements() == xs.length) {
        val cid = c.get(0, idType)
        if (idOrd.compare(cid, self) != 0) {
          var acc = 0.0
          var j = 0
          while (j < xs.length) { acc += xs(j) * cv.getDouble(j); j += 1 }
          val s = acc / (qn * c.getDouble(2))
          if (size < k) {
            sims(size) = s; ids(size) = cid
            size += 1
            siftUp(size - 1)
          } else if (rankCmp(s, cid, sims(0), ids(0)) < 0) {
            sims(0) = s; ids(0) = cid
            siftDown()
          }
        }
      }
      i += 1
    }
    // pop worst-first into the output tail → array lands rank-ascending
    val out = new Array[Any](size)
    var p = size - 1
    while (p >= 0) {
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sims(0), ids(0)))
      size -= 1
      sims(0) = sims(size); ids(0) = ids(size)
      siftDown()
      p -= 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(qv = newFirst, qnorm = newSecond, selfId = newThird, list = newFourth)
}

/** Native ADC fold: Σ_s lut[s][codes[s]] over a per-vector code array
  * (array<bigint>, one code per subspace) and a nested LUT
  * (array<array<bigint>>, outer index = subspace, inner = code) —
  * the packed IVF-PQ probes' scoring kernel, evaluated once per
  * (query, candidate) row over ~nprobe·N/nlist candidates.
  *
  * Exists because the HOF formulation
  * `aggregate(sequence(0,m-1), 0L, (acc,s) -> acc + element_at(
  * element_at(lut, s+1), codes[s]+1))` is CodegenFallback — Spark's
  * higher-order functions evaluate INTERPRETED, lambda dispatch per
  * element per row, which measured as the packed probe running no
  * faster than the long form it was built to beat (1M pqdim point:
  * ~10 s both). doGenCode emits m array reads and adds.
  *
  * NULL contract: null inputs → null (BinaryExpression); a code
  * outside its LUT row, or a null LUT cell, yields NULL for the whole
  * fold (pq_encode guarantees in-range codes — out-of-range means a
  * corrupted index, and the NULL surfaces through the probes'
  * documented NULL-sim exclusion rather than a mid-job ANSI throw).
  */
case class AdcFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "adc_fold"

  override def nullSafeEval(c: Any, l: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val lut = l.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() < m) return null
    var acc = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || lut.isNullAt(s)) return null
      val row = lut.getArray(s)
      val code = codes.getLong(s).toInt
      if (code < 0 || code >= row.numElements() || row.isNullAt(code))
        return null
      acc += row.getLong(code)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val ad = classOf[ArrayData].getName
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |if ($l.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($c.isNullAt($s) || $l.isNullAt($s)) { $bad = true; break; }
         |    $ad $row = $l.getArray($s);
         |    int $code = (int) $c.getLong($s);
         |    if ($code < 0 || $code >= $row.numElements() || $row.isNullAt($code)) {
         |      $bad = true; break;
         |    }
         |    $acc += $row.getLong($code);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level wrapper: dot product of two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column-level wrapper: packed-ADC fold of a code array against a
    * nested per-subspace LUT.
    */
  def adc_fold(codes: Column, lut: Column): Column =
    ColumnBridge.column(AdcFold(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut)))

  /** Column-level wrapper: fused cosine top-k of one query against one
    * inverted-list row (array<struct<cand_id, cv, cnorm>>).
    */
  def cosine_topk(qv: Column, qnorm: Column, selfId: Column, list: Column,
      k: Int): Column =
    ColumnBridge.column(CosineTopK(ColumnBridge.expression(qv),
      ColumnBridge.expression(qnorm), ColumnBridge.expression(selfId),
      ColumnBridge.expression(list), k))

  /** Column-level wrapper: squared L2 over two array<bigint> columns. */
  def vec_sqdist_long(a: Column, b: Column): Column =
    ColumnBridge.column(LongSqDist(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column-level wrapper: dot product of two array<bigint> columns. */
  def vec_dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column-level wrapper: nearest-centroid id for an array<double>
    * vector against an id-ASCENDING array<struct<id,v,norm>> column.
    */
  def nearest_centroid(vec: Column, cnorm: Column, cents: Column): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec),
      ColumnBridge.expression(cnorm), ColumnBridge.expression(cents)))

  /** Column-level wrapper: nearest-cell id (integer squared-L2 order)
    * for an array<bigint> vector against a cid-ASCENDING
    * array<struct<cid,qc,nc>> column.
    */
  def nearest_cell_long(vec: Column, cells: Column): Column =
    ColumnBridge.column(NearestCellLong(ColumnBridge.expression(vec),
      ColumnBridge.expression(cells)))

  /** Column-level wrapper: PQ codes (array<bigint>, one code per
    * subspace) for an array<bigint> vector against a cid-ASCENDING
    * array<struct<cid,qc>> codebook column.
    */
  def pq_encode(vec: Column, cents: Column, m: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec),
      ColumnBridge.expression(cents), m))
}
