package graft.core

/** The one Timestamp→epoch-micros conversion, shared by every site
  * whose outputs must stay bit-identical (the fMGWS and TWS
  * sessionizer twins are spec'd output-equal, and the metricgen
  * pushdown bounds must agree with what those operators compute) — a
  * drifted private copy would silently split the twins.
  */
object TimeCodec {

  /** `getTime` already carries the nanos' millisecond part; only the
    * sub-millisecond remainder is added back.
    */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000
}
