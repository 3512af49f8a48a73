package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** min_{0 ≤ j < w} md5(id ‖ '|' ‖ j) — the weighted-sampling ticket
  * draw of [[graft.operators.Sampling.weightedSample]] as ONE scalar
  * expression.
  *
  * Byte-identical to the compositional form
  * `min(md5(concat(id, '|', j)))` over an exploded `sequence(0, w-1)`
  * (the driver's oracle still computes it that way — equality through
  * the hash gate proves the loop matches), but with the Σw-row
  * amplification and its collapsing aggregate GONE: per row this is an
  * O(w) register loop feeding straight into TakeOrdered. At 100 TB the
  * explode form materializes Σw rows into the partial aggregate;
  * this form touches each input row once.
  *
  * Same preference-order (b) rationale as [[DotProduct]]: the built-in
  * composition is semantically right but allocates a row per ticket on
  * the hot path.
  */
case class MinTicketKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "min_ticket_key"

  override def nullSafeEval(id: Any, w: Any): Any =
    MinTicketKey.compute(id.asInstanceOf[UTF8String], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idc, wc) => {
      s"""
         |${ev.value} = graft.functions.MinTicketKey$$.MODULE$$.compute($idc, $wc);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinTicketKey =
    copy(left = newLeft, right = newRight)
}

object MinTicketKey {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase-hex MD5 minimum over the w tickets; null for w ≤ 0
    * (callers filter weight ≥ 1; the null keeps the expression total).
    */
  def compute(id: UTF8String, w: Long): UTF8String = {
    if (w <= 0) return null
    val md = MessageDigest.getInstance("MD5")
    val idStr = id.toString
    var min: String = null
    var j = 0L
    while (j < w) {
      md.reset()
      val digest = md.digest((idStr + "|" + j).getBytes(UTF_8))
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < 16) {
        sb.append(hexDigits((digest(i) >> 4) & 0xf))
        sb.append(hexDigits(digest(i) & 0xf))
        i += 1
      }
      val hex = sb.toString
      if (min == null || hex.compareTo(min) < 0) min = hex
      j += 1
    }
    UTF8String.fromString(min)
  }

  /** Column-level entry point. */
  def minTicketKey(id: Column, w: Column): Column =
    ColumnBridge.column(
      MinTicketKey(ColumnBridge.expression(id), ColumnBridge.expression(w)))
}
