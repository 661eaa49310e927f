package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE connector — the other half of the V2 surface
  * next to [[SynthSource]]'s read path. A metrics-only sink
  * (`format("graft-counting-sink").option("tag", ...)`) that exercises
  * the full distributed commit protocol:
  *
  *  - one [[DataWriter]] per task buffers only a COUNT (no data): at
  *    100 TB a sink writer must never hold rows;
  *  - each task emits a [[WriterCommitMessage]]; the driver commits the
  *    job only when EVERY task reported success — Spark re-attempts
  *    failed tasks and calls `abort` on job failure, which is exactly
  *    the two-phase protocol a real table format (Iceberg/Delta-style)
  *    plugs into;
  *  - committed totals land in a driver-side registry keyed by the
  *    caller's `tag`, where the spec (and any metrics scraper) reads
  *    them; aborted jobs record nothing.
  */
class CountingSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-counting-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingSinkTable(schema, properties.getOrDefault("tag", "default"))
}

object CountingSink {
  /** tag -> (committed row count, task commit messages seen). */
  private val committed = new ConcurrentHashMap[String, (Long, Int)]()
  /** tag -> committed streaming epoch ids, in commit order. */
  private val epochs = new ConcurrentHashMap[String, List[Long]]()

  def committedRows(tag: String): Option[Long] =
    Option(committed.get(tag)).map(_._1)
  def committedTasks(tag: String): Option[Int] =
    Option(committed.get(tag)).map(_._2)
  def committedEpochs(tag: String): List[Long] =
    Option(epochs.get(tag)).getOrElse(Nil).reverse
  private[sources] def record(tag: String, rows: Long, tasks: Int): Unit =
    committed.put(tag, (rows, tasks))
  /** Per-epoch commit, IDEMPOTENT on the epoch id: a query that fails
    * between the sink commit and Spark's commit-log write replays the
    * epoch with the same id on restart — merging again would
    * double-count. The registry is the transaction log here, so it is
    * keyed by epoch id like a real table format's.
    */
  private[sources] def recordEpoch(tag: String, epochId: Long, rows: Long): Unit =
    synchronized {
      val seen = Option(epochs.get(tag)).getOrElse(Nil)
      if (!seen.contains(epochId)) {
        committed.merge(tag, (rows, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2))
        epochs.put(tag, epochId :: seen)
      }
    }
}

private[sources] class CountingSinkTable(schema: StructType, tag: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_counting_sink($tag)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // Truncate is a no-op for a metrics sink; accepting it lets
      // callers use SaveMode.Overwrite.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountingBatchWrite(tag)
        override def toStreaming: StreamingWrite = new CountingStreamingWrite(tag)
      }
    }
}

private[sources] case class CountMessage(rows: Long) extends WriterCommitMessage

private[sources] class CountingBatchWrite(tag: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CountingWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case CountMessage(n) => n }.sum
    CountingSink.record(tag, rows, messages.length)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CountingWriter
}

private[sources] class CountingWriter extends DataWriter[InternalRow] {
  private var n = 0L
  override def write(record: InternalRow): Unit = n += 1
  override def commit(): WriterCommitMessage = CountMessage(n)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** Streaming half of the commit protocol: per-epoch (micro-batch)
  * two-phase commit. The engine calls `commit(epochId, messages)`
  * exactly once per successful epoch and replays FAILED epochs with
  * the same id — an idempotent downstream (a real table format keys
  * its transaction log by epoch) gets exactly-once semantics.
  */
private[sources] class CountingStreamingWrite(tag: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      override def createWriter(
          partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
        new CountingWriter
    }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CountingSink.recordEpoch(
      tag, epochId, messages.collect { case CountMessage(n) => n }.sum)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}
