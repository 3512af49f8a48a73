package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-layout writers/readers: the physical-design levers that matter
  * at 100 TB.
  *
  *  - **Partitioned layout** (`partitionBy` directories): coarse,
  *    low-cardinality columns (date, event_type, lang). Partition
  *    pruning then removes whole directories from a filtered scan —
  *    visible as PartitionFilters in the plan.
  *  - **Bucketed layout** (`bucketBy` + table): high-cardinality join
  *    keys. Two tables bucketed the same way join with ZERO shuffle
  *    (both sides already hash-distributed on the key).
  *  - **Sorted within files** (`sortWithinPartitions`): min/max footer
  *    stats become selective → row-group skipping on range predicates.
  */
object ParquetLake {

  /** Write a directory-partitioned, file-sorted parquet dataset. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.repartition(partitionCols.map(df.col): _*)
          .sortWithinPartitions(sortCols.map(df.col): _*)
      else df
    sorted.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Write a bucketed table (requires a table name — bucket metadata
    * lives in the catalog). Joins/aggregations on `bucketCols` between
    * tables bucketed with the same count are shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
