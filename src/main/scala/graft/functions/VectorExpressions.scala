package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

object VectorFunctions {
  /** Column-level wrapper: dot product of two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column-level wrapper: squared L2 over two array<bigint> columns. */
  def vec_sqdist_long(a: Column, b: Column): Column =
    ColumnBridge.column(LongSqDist(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column-level wrapper: dot product of two array<bigint> columns. */
  def vec_dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
