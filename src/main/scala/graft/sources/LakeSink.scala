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
  * Sink commits RECORD zone-map stats for the integral columns named
  * in `.option("statsCols", "a,b")`: each task tracks per-column
  * min/max WHILE STREAMING its rows (zero extra I/O — the scalable
  * alternative to a post-write stats scan), the commit message
  * carries them, and the driver folds the per-file spans into the
  * published [[GraftLake.SetStats]] — so `readPruned`/merge/delete
  * skip sink-written sets exactly like batch-committed ones.
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
    val statsCols = Option(properties.get("statsCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    statsCols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"statsCols column '$c' not in the write schema"))
      require(f.dataType == LongType || f.dataType == IntegerType,
        s"statsCols column '$c' must be integral, got ${f.dataType}")
    }
    new LakeSinkTable(path, schema, statsCols)
  }
}

private[sources] class LakeSinkTable(
    path: String, writeSchema: StructType, statsCols: Seq[String])
    extends Table with SupportsWrite {
  override def name(): String = s"graft_lake_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LakeBatchWrite(path, info.schema(), statsCols)
        override def toStreaming: StreamingWrite =
          new LakeStreamingWrite(path, info.schema(), statsCols)
      }
    }
}

/** Staged file name + row count + streamed min/max per stats column —
  * all that crosses task → driver.
  */
private[sources] case class StagedFileMessage(
    file: String, rows: Long,
    stats: Seq[(String, Long, Long)] = Seq.empty)
    extends WriterCommitMessage

/** Serializable task-side factory — ships only (path, schema DDL,
  * stats column names).
  */
private[sources] case class LakeWriterFactory(
    path: String, schemaDdl: String, statsCols: Seq[String])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, 0L)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new LakeParquetWriter(path, StructType.fromDDL(schemaDdl),
      partitionId, taskId, epochId, statsCols)
}

private[sources] class LakeBatchWrite(
    path: String, schema: StructType, statsCols: Seq[String])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LakeWriterFactory(path, schema.toDDL, statsCols)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit(path, schema, messages, tag = None)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LakeSinkCommit.discard(messages)
}

private[sources] class LakeStreamingWrite(
    path: String, schema: StructType, statsCols: Seq[String])
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LakeWriterFactory(path, schema.toDDL, statsCols)
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
      // Fold per-file spans into set-level stats: a column's entry
      // publishes only if EVERY contributing file reported one (a
      // file whose rows were all NULL in the column has no span, and
      // a partial span would prune unsoundly).
      val perCol = data.flatMap(_.stats).groupBy(_._1)
      val setStats = perCol.collect {
        case (c, spans) if spans.length == data.length =>
          GraftLake.SetStats(c, spans.map(_._2).min, spans.map(_._3).max)
      }.toSeq.sortBy(_.col)
      GraftLake.commitStagedFiles(
        path, data.map(_.file).toSeq, schema, tag, setStats)
    }
  }

  def discard(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case StagedFileMessage(f, _, _) =>
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
    partitionId: Int, taskId: Long, epochId: Long,
    statsCols: Seq[String] = Seq.empty)
    extends DataWriter[InternalRow] {

  // (field index, running min, running max, seen-any) per stats column
  // — updated inline with each row, so stats cost no second pass.
  private val statsTrack: Array[(Int, String)] = statsCols
    .map(c => (schema.fieldIndex(c), c)).toArray
  private val statsMin = Array.fill(statsTrack.length)(Long.MaxValue)
  private val statsMax = Array.fill(statsTrack.length)(Long.MinValue)
  private val statsSeen = Array.fill(statsTrack.length)(false)

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
    var s = 0
    while (s < statsTrack.length) {
      val (idx, _) = statsTrack(s)
      if (!record.isNullAt(idx)) {
        val v = schema.fields(idx).dataType match {
          case IntegerType => record.getInt(idx).toLong
          case _ => record.getLong(idx)
        }
        if (v < statsMin(s)) statsMin(s) = v
        if (v > statsMax(s)) statsMax(s) = v
        statsSeen(s) = true
      }
      s += 1
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
    val st = statsTrack.indices.collect {
      case s if statsSeen(s) => (statsTrack(s)._2, statsMin(s), statsMax(s))
    }.toSeq
    StagedFileMessage(file, rows, st)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    dropCrcSidecar()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  override def close(): Unit = ()
}
