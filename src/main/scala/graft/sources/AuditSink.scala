package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory,
  StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `auditsink` — a DataSource V2 write connector that lands nothing and
  * accounts for everything: per-commit row counts and an
  * order-independent value checksum, recorded on the driver through the
  * REAL V2 commit protocol (task `DataWriter.commit` → driver
  * `BatchWrite.commit` / `StreamingWrite.commit(epochId, _)`).
  *
  * This is the write-side twin of the reference consumers' delivery
  * accounting (`consumers/consumer1.py:44-53` counts appended messages
  * per topic): instead of trusting the transport, the sink proves WHAT
  * landed — `rows` and `checksum` per commit — while exercising the
  * exact protocol a real exactly-once sink implements:
  *
  *  - task writers accumulate locally and surface totals only in their
  *    commit message; an ABORTED task's partials never reach the
  *    driver (the failed-task/speculative-duplicate story);
  *  - the driver commit is IDEMPOTENT PER (QUERY RUN, EPOCH) for
  *    streaming — a replayed `commit(epoch, _)` after a driver
  *    recovery re-delivers the same epoch and must not double-count
  *    (Spark's streaming sink contract; AuditSinkSpec replays one),
  *    while a DIFFERENT query run writing the same channel counts
  *    (epoch ids restart at 0 per run, so epoch alone is no identity);
  *  - the checksum is an order- and partitioning-independent fold
  *    (sum + xor of per-row 64-bit hashes), so two writes of the same
  *    relation match regardless of task layout — which is what makes
  *    it a usable end-to-end integrity gate in tests and canaries.
  *
  * Scale: task state is two longs; commit messages are O(1); the
  * driver registry is O(channels + epochs). Nothing touches disk.
  *
  * Usage: `df.write.format("auditsink").option("channel", "x").save()`;
  * read back via [[AuditSink.stats]]/[[AuditSink.epochs]].
  */
class AuditSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "auditsink"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  // a SQL `CREATE TABLE (cols...) USING auditsink` declares a schema;
  // the sink accepts any (it only hashes rows), so external metadata
  // is supported and ignored
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditSinkTable(schema, properties)
}

object AuditSink {

  /** One committed write (batch commits carry unique negative ids). */
  final case class Commit(epochId: Long, rows: Long, checksumSum: Long,
                          checksumXor: Long)

  // value = (arrival seq, commit): the dedup key is (queryId, epochId)
  // but readback order is ARRIVAL — (queryId, epochId) sorts batch
  // commits (negative descending ids) newest-first and interleaves
  // multi-query channels by queryId string, neither of which is the
  // "epoch-ordered" a consumer means
  private val registry =
    new TrieMap[String, TrieMap[(String, Long), (Long, Commit)]]()
  private val batchSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val arrivalSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Replay-idempotence is keyed (queryId, epochId): Spark's epoch ids
    * are PER QUERY RUN (a restart from a fresh checkpoint starts over
    * at 0), so channel+epoch alone would silently drop a second
    * query's — or a re-checkpointed pipeline's — commits as replays.
    */
  private[sources] def record(channel: String, queryId: String,
      c: Commit): Unit = {
    val epochs = registry.getOrElseUpdate(channel,
      new TrieMap[(String, Long), (Long, Commit)]())
    // idempotent per (query, epoch): a replayed streaming commit no-ops
    epochs.putIfAbsent((queryId, c.epochId),
      (arrivalSeq.incrementAndGet(), c))
  }

  /** Batch commits have no engine epoch; each gets a unique NEGATIVE
    * id so repeated batch writes to one channel all count (only
    * streaming epochs carry replay-idempotence semantics).
    */
  private[sources] def nextBatchEpoch(): Long = -batchSeq.incrementAndGet()

  /** All commits of a channel, in ARRIVAL order. */
  def epochs(channel: String): Seq[Commit] =
    registry.get(channel)
      .map(_.values.toSeq.sortBy(_._1).map(_._2)).getOrElse(Nil)

  /** (total rows, combined sum-checksum, combined xor-checksum). */
  def stats(channel: String): (Long, Long, Long) = {
    val cs = epochs(channel)
    (cs.map(_.rows).sum, cs.map(_.checksumSum).sum,
      cs.foldLeft(0L)(_ ^ _.checksumXor))
  }

  def clear(channel: String): Unit = registry.remove(channel)
}

private[sources] class AuditSinkTable(declared: StructType,
    props: java.util.Map[String, String]) extends Table with SupportsWrite {
  override def name(): String = "auditsink"
  // a catalog table must report its DECLARED columns (INSERT resolves
  // against them); the path API passes an empty struct, and
  // ACCEPT_ANY_SCHEMA lets any query schema through either way
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a catalog table's CREATE OPTIONS arrive as properties (possibly
    // `option.`-prefixed), write-time options win — same contract as
    // MetricGenTable.mergedOptions
    val channel = MetricGenTable.mergedOptions(props, info.options)
      .getOrDefault("channel", "default")
    new AuditWriteBuilder(channel, info.queryId)
  }
}

private[sources] class AuditWriteBuilder(channel: String, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // nothing lands; nothing to cut
  override def build(): Write = new AuditWrite(channel, queryId)
}

private[sources] class AuditWrite(channel: String, queryId: String) extends Write {
  override def description(): String = s"auditsink[$channel]"
  override def toBatch: BatchWrite = new AuditBatchWrite(channel)
  override def toStreaming: StreamingWrite =
    new AuditStreamingWrite(channel, queryId)
}

/** Task-side totals; only ever reaches the driver through commit(). */
private[sources] final case class AuditTaskTotals(rows: Long, sum: Long,
    xor: Long) extends WriterCommitMessage

private[sources] object AuditProtocol {
  def fold(msgs: Array[WriterCommitMessage], epochId: Long): AuditSink.Commit = {
    var rows = 0L; var sum = 0L; var xor = 0L
    msgs.foreach {
      case AuditTaskTotals(r, s, x) => rows += r; sum += s; xor ^= x
      case _ => ()
    }
    AuditSink.Commit(epochId, rows, sum, xor)
  }
}

private[sources] class AuditBatchWrite(channel: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    AuditSink.record(channel, queryId = "batch",
      AuditProtocol.fold(messages, AuditSink.nextBatchEpoch()))
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AuditStreamingWrite(channel: String,
    queryId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new AuditWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    AuditSink.record(channel, queryId, AuditProtocol.fold(messages, epochId))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AuditWriterFactory
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditDataWriter
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new AuditDataWriter
}

private[sources] class AuditDataWriter extends DataWriter[InternalRow] {
  private var rows = 0L
  private var sum = 0L
  private var xor = 0L

  override def write(row: InternalRow): Unit = {
    // rows arrive as UnsafeRow on the write path; its bytes are a
    // deterministic function of (schema, values), so a 64-bit mix of
    // them is a value checksum. sum+xor make the channel-level combine
    // independent of row order AND task partitioning.
    val h = row match {
      case u: UnsafeRow =>
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.getSizeInBytes, 42).toLong
      case other => other.hashCode.toLong
    }
    rows += 1; sum += h; xor ^= h
  }

  override def commit(): WriterCommitMessage = AuditTaskTotals(rows, sum, xor)

  override def abort(): Unit = { rows = 0; sum = 0; xor = 0 } // partials die here

  override def close(): Unit = ()
}
