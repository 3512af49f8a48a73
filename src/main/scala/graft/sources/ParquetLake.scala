package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) key: interleave the low `bits` bits of each
    * dimension (clamped non-negative, masked) into one long. Sorting or
    * range-partitioning by this key gives MULTI-dimensional locality
    * from a ONE-dimensional layout: a file holding a z-range covers a
    * small tile in every interleaved dimension at once, so parquet
    * min/max footer stats become selective for predicates on ANY of the
    * dimensions — plain sort-by-(a,b) only skips on `a`. This is the
    * standard lakehouse data-skipping layout for multi-key workloads.
    *
    * Pure integer shift/mask expression tree — fully codegen'd, scan
    * speed; `dims.size * bits` must fit a long (≤ 63).
    */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 63)
    val masked = dims.map(d =>
      greatest(d.cast("long"), lit(0L)).bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (d, i) <- masked.zipWithIndex
    } yield shiftleft(
      shiftright(d, b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` in Z-order on `dims`: range-partition by the morton
    * key into `files` output files, sort within each, write. Each file
    * then spans one z-range = one small multi-dim tile.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    bits: Int, files: Int): Unit =
    df.withColumn("__z", zOrderKey(dims.map(df.col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
