package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest/egest on the raw Avro core library —
  * the mainstream warehouse exchange format the parquet/csv/json/orc
  * round-trips (Sources.scala) don't cover. No connector dependency:
  * the distributed shape is the library's own —
  *
  *  - WRITE: one task per partition streams its rows through a
  *    `DataFileWriter[GenericRecord]` into `dir/part-NNNNN.avro`
  *    (deflate-compressed, schema embedded in the container header,
  *    so any Avro reader — a different engine included — consumes the
  *    files). Nothing row-sized touches the driver.
  *  - READ: the file list parallelizes across executors; each task
  *    decodes its files with `DataFileReader` and emits Rows under
  *    the supplied Spark schema. Parallelism = files, the same
  *    granularity the parquet scan gets from its splits.
  *
  * Type mapping (both directions): long/int/double/boolean/string map
  * directly; DateType rides Avro's `date` logical type (epoch days in
  * an int), TimestampType rides `timestamp-micros`, TimestampNTZType
  * rides `local-timestamp-micros`; nullable columns become `[null, T]`
  * unions. That covers every TESTDATA table; nested structs would
  * extend the same switch.
  */
object AvroIO {

  /** The Avro schema (JSON) mirroring a Spark schema — built as a
    * string so executors can re-parse it without serializing Schema
    * (Avro's Schema is not java-serializable).
    */
  def avroSchemaJson(schema: StructType, name: String = "graft_row"): String = {
    def one(f: StructField): String = {
      val base = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case BooleanType => "\"boolean\""
        case StringType => "\"string\""
        case DateType => """{"type":"int","logicalType":"date"}"""
        case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
        case TimestampNTZType =>
          """{"type":"long","logicalType":"local-timestamp-micros"}"""
        case dt => throw new IllegalArgumentException(
          s"AvroIO: unsupported type $dt for column '${f.name}'")
      }
      val t = if (f.nullable) s"""["null",$base]""" else base
      s"""{"name":"${f.name}","type":$t${if (f.nullable) ""","default":null""" else ""}}"""
    }
    s"""{"type":"record","name":"$name","fields":[${schema.fields.map(one).mkString(",")}]}"""
  }

  /** Write `df` as Avro container files under `dir`, one per
    * partition. Returns the number of files written.
    */
  def write(df: DataFrame, dir: String): Int = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(json)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
        writer.create(schema, new File(f"$dir/part-$pid%05d.avro"))
        var n = 0L
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, toAvro(row, i, sparkSchema.fields(i).dataType))
            i += 1
          }
          writer.append(rec)
          n += 1
        }
        writer.close()
        Iterator.single(n)
      }
    }.collect() // O(partitions) counts — bounded driver metadata
    counts.length
  }

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => java.lang.Long.valueOf(row.getLong(i))
      case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getString(i)
      case DateType =>
        java.lang.Integer.valueOf(row.getDate(i).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val t = row.getTimestamp(i)
        java.lang.Long.valueOf(
          t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L)
      case TimestampNTZType =>
        val t = row.getAs[java.time.LocalDateTime](i)
        java.lang.Long.valueOf(
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  /** Read the Avro container files under `dir` as a DataFrame with
    * `schema` (the write-side Spark schema).
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.toString)
      .filter(_.endsWith(".avro")).toSeq.sorted
    val fields = schema.fields
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val reader = new DataFileReader[GenericRecord](
          new File(file), new GenericDatumReader[GenericRecord]())
        val it = reader.iterator().asScala.map { rec =>
          Row.fromSeq(fields.indices.map(i => fromAvro(rec.get(i), fields(i).dataType)))
        }
        // DataFileReader is exhausted before close: materialize the
        // file's rows (file-sized, executor-local — the same unit a
        // parquet task holds decoded).
        val rows = it.toVector
        reader.close()
        rows
      }
    spark.createDataFrame(rdd, schema)
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Avro Utf8 -> String
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Integer].longValue()))
      case TimestampType =>
        val us = v.asInstanceOf[java.lang.Long].longValue()
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
      case TimestampNTZType =>
        val us = v.asInstanceOf[java.lang.Long].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => v
    }
}
