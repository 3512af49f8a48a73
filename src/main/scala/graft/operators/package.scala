package graft

import org.apache.spark.sql.{Column, DataFrame}

package object operators {

  /** Re-split a DataFrame across full parallelism by a key before a
    * row-amplifying transform (explode-style generators multiply row
    * counts ~100×, but scan parallelism is fixed by INPUT bytes — a
    * sub-split-size table otherwise funnels all generated work through
    * one or two tasks). The exchange moves only input-sized data, which
    * the amplification immediately dwarfs; hashing on the document key
    * keeps each document's rows co-located AND satisfies the
    * distribution a later groupBy(key) needs, so that aggregate runs
    * exchange-free. At cluster scale the scan already has many splits
    * and this becomes a cheap co-partitioning step rather than a rescue.
    */
  private[graft] def spreadByKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
