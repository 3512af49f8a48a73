package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness parquet fixtures (/root/repo/TESTDATA.md).
  *
  * All tables are read with their parquet-embedded schema (no inference
  * pass — the footer carries exact types), so column pruning and filter
  * pushdown reach the scan. At 100 TB these would be partitioned
  * directories; the single-file layout here is the sf<=0.1 test shape,
  * and nothing below assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` has shipped with two physical `ts` encodings across
    * harness generations: INT64 TIMESTAMP(NANOS) (Spark 4 rejects it by
    * default → read nanos as long, truncate to µs) and, currently, plain
    * `timestamp[us]` with no zone, which Spark 4 surfaces as
    * TIMESTAMP_NTZ. Every downstream operator (event-time windows,
    * `unix_micros`, watermarking) expects the session-zoned TIMESTAMP
    * type, so both shapes are normalized here — under the pipeline's
    * pinned UTC session timezone the NTZ→LTZ cast is value-identity and
    * matches DuckDB's naive read of the same file, keeping oracles
    * comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
