package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 WRITE connector for [[GraftLake]] — the sink half of the lake
  * loop as a first-class format:
  *
  * {{{
  *   df.writeStream.format("graft-lake").option("path", t)
  *     .option("checkpointLocation", ...).start()     // streaming
  *   df.write.format("graft-lake").option("path", t).save() // batch
  * }}}
  *
  * Two-phase commit, the shape every real table-format sink uses:
  *
  *  - EXECUTOR side: one [[DataWriter]] per task streams its rows into
  *    a parquet part-file under `table/_staging/` (parquet-hadoop
  *    writer — rows never buffer in memory beyond the page size, and
  *    never touch the driver). The commit message carries only the
  *    staged file name + row count (metadata-sized).
  *  - DRIVER side: `commit` moves the staged files into a fresh
  *    file-set and publishes ONE atomic log entry via the ordinary
  *    claim/publish protocol ([[GraftLake.commitStagedFiles]]).
  *    Readers see all of an epoch's rows or none.
  *
  * EXACTLY-ONCE (streaming): the log entry is tagged
  * `graft-lake-sink-epoch-<id>`; Spark replays a failed epoch with the
  * SAME id, the tag is found, the replayed staging files are discarded
  * and the already-committed version is returned — the DSv2-native
  * dual of st10's `foreachBatch` + [[GraftLake.appendIdempotent]].
  * Task retries are safe on both paths: an aborted task's staged file
  * is deleted, and an orphaned one (executor death mid-write) is never
  * referenced by any commit message, so it stays invisible and is
  * reclaimed by `_staging` cleanup at the next successful commit.
  *
  * Sink commits carry no zone-map stats (readers are conservative);
  * `compact`/`compactZOrder` re-establish stats and layout downstream.
  * Primitive column types (long/int/double/float/boolean/string/date/
  * timestamp) mirror the `graft-lake-stream` read side.
  */
class LakeSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: the query supplies the schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-lake sink requires option 'path'")
    new LakeSinkTable(path, schema)
  }
}

private[sources] class LakeSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_lake_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LakeBatchWrite(path, info.schema())
        override def toStreaming: StreamingWrite =
          new LakeStreamingWrite(path, info.schema())
      }
    }
}

/** Staged file name + row count — all that crosses task → driver. */
private[sources] case class StagedFileMessage(file: String, rows: Long)
    extends WriterCommitMessage

/** Serializable task-side factory — ships only (path, schema DDL). */
private[sources] case class LakeWriterFactory(path: String, schemaDdl: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, 0L)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new LakeParquetWriter(path, StructType.fromDDL(schemaDdl),
      partitionId, taskId, epochId)
}

private[sources] class LakeBatchWrite(path: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LakeWriterFactory(path, schema.toDDL)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit(path, schema, messages, tag = None)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit.discard(messages)
}

private[sources] class LakeStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LakeWriterFactory(path, schema.toDDL)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit(path, schema, messages,
      tag = Some(s"graft-lake-sink-epoch-$epochId"))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit.discard(messages)
}

private[sources] object LakeSinkCommit {
  /** Driver-side job commit: publish the epoch's staged files as one
    * atomic (optionally tagged) lake commit. An empty epoch commits
    * nothing — GraftLake versions advance only when data lands.
    */
  def apply(
      path: String, schema: StructType,
      messages: Array[WriterCommitMessage], tag: Option[String]): Unit = {
    // Zero-row part files (empty partitions / empty epochs) never join
    // a commit — an all-empty epoch advances no version at all.
    val (data, empty) = messages
      .collect { case m: StagedFileMessage => m }
      .partition(_.rows > 0)
    empty.foreach(m =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(m.file)))
    if (data.nonEmpty) {
      GraftLake.commitStagedFiles(path, data.map(_.file).toSeq, schema, tag)
    }
  }

  def discard(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case StagedFileMessage(f, _) =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f))
    }
}

/** Executor-side parquet writer: streams [[InternalRow]]s into one
  * staged part-file via parquet-hadoop's example Group API, with
  * logical-type annotations matching what Spark's own parquet writer
  * emits (so the staged files read back identically). `abort` deletes
  * the staged file — a failed task leaves nothing behind.
  */
private[sources] class LakeParquetWriter(
    tablePath: String, schema: StructType,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val stagingDir = java.nio.file.Paths.get(tablePath, "_staging")
  java.nio.file.Files.createDirectories(stagingDir)
  private val file = stagingDir.resolve(
    f"e$epochId%05d-p$partitionId%05d-t$taskId-" +
      s"${java.util.UUID.randomUUID().toString.take(8)}.parquet").toString

  private val messageType: MessageType =
    MessageTypeParser.parseMessageType(
      schema.fields.map { f =>
        // Annotation follows the field name in parquet schema syntax.
        val (t, ann) = f.dataType match {
          case LongType => ("int64", "")
          case IntegerType => ("int32", "")
          case DoubleType => ("double", "")
          case FloatType => ("float", "")
          case BooleanType => ("boolean", "")
          case StringType => ("binary", " (STRING)")
          case DateType => ("int32", " (DATE)")
          case TimestampType => ("int64", " (TIMESTAMP(MICROS,true))")
          case TimestampNTZType => ("int64", " (TIMESTAMP(MICROS,false))")
          case dt => throw new IllegalArgumentException(
            s"graft-lake sink: unsupported column type $dt for '${f.name}'")
        }
        s"optional $t ${f.name}$ann;"
      }.mkString("message spark_schema {\n", "\n", "\n}"))

  private val groups = new SimpleGroupFactory(messageType)
  private val writer: ParquetWriter[Group] = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(messageType, conf)
    ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withConf(conf)
      .build()
  }
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val g = groups.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i)) {
        val name = schema.fields(i).name
        schema.fields(i).dataType match {
          case LongType => g.append(name, record.getLong(i))
          case IntegerType => g.append(name, record.getInt(i))
          case DoubleType => g.append(name, record.getDouble(i))
          case FloatType => g.append(name, record.getFloat(i))
          case BooleanType => g.append(name, record.getBoolean(i))
          case StringType => g.append(name, record.getUTF8String(i).toString)
          case DateType => g.append(name, record.getInt(i)) // days since epoch
          case TimestampType | TimestampNTZType =>
            g.append(name, record.getLong(i)) // micros since epoch
          case dt => throw new IllegalArgumentException(s"unsupported $dt")
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  /** Hadoop's local FS writes a sibling `.name.crc` checksum; the
    * parquet footer has its own integrity, so drop it rather than
    * leak it in `_staging` (the data file moves away at commit).
    */
  private def dropCrcSidecar(): Unit = {
    val p = java.nio.file.Paths.get(file)
    java.nio.file.Files.deleteIfExists(
      p.getParent.resolve("." + p.getFileName.toString + ".crc"))
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    dropCrcSidecar()
    StagedFileMessage(file, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    dropCrcSidecar()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  override def close(): Unit = ()
}
