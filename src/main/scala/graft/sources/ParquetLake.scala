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

  /** Small-file compaction — the lake-maintenance chore that decides
    * scan health at 100 TB: streaming/append workloads leave thousands
    * of KB-sized files per partition, and every one costs a task, a
    * footer read, and NameNode/listing pressure. Rewrites `inPath` to
    * `outPath` in ~`targetFileBytes` files (computed from the ACTUAL
    * byte size on disk, not a row guess), preserving content exactly.
    * Writes to a fresh directory rather than in place — the caller
    * swaps paths/symlinks atomically; self-overwrite would read and
    * clobber the same files.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(inPath != outPath, "compact() writes to a fresh directory; swap after")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) buf += f }
      buf.toSeq
    }
    val before = parquetFiles(inPath)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // coalesce, not repartition: merging files needs no shuffle
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    (before.size, parquetFiles(outPath).size)
  }
}
