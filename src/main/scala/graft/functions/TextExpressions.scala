package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
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
