package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, IcebergImport}

/** Iceberg import: the published metadata.json → manifest-list →
  * manifest → parquet chain folds to the right live set, position
  * deletes mask exactly their rows through the distributed anti-join,
  * and every unsupported protocol feature refuses loudly. Tables are
  * staged BY HAND against the public spec (no Iceberg library), the
  * same posture as DeltaImportSpec — and the reader resolves Avro
  * fields BY NAME so engine-written manifests with more fields than
  * these minimal ones read identically.
  */
class IcebergImportSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-iceberg").resolve("t").toString

  /** Write one Avro container file of `rows` under `schemaJson`. */
  private def writeAvro(
      path: String, schemaJson: String, rows: Seq[Map[String, Any]]): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    Files.createDirectories(Paths.get(path).getParent)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    def toRec(s: Schema, m: Map[String, Any]): GenericData.Record = {
      val rec = new GenericData.Record(s)
      m.foreach { case (k, v) =>
        val fs = {
          val f = s.getField(k).schema()
          if (f.getType == Schema.Type.UNION) f.getTypes.get(1) else f
        }
        val vv: AnyRef = v match {
          case sub: Map[String, Any] @unchecked => toRec(fs, sub)
          case other => other.asInstanceOf[AnyRef]
        }
        rec.put(k, vv)
      }
      rec
    }
    rows.foreach(m => w.append(toRec(schema, m)))
    w.close()
  }

  private val manifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"content","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin

  private val manifestEntrySchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"}]}}]}""".stripMargin

  /** Stage `df` as one parquet file at `<t>/data/<name>.parquet`. */
  private def stageData(t: String, df: org.apache.spark.sql.DataFrame,
      name: String): String = {
    val tmp = s"$t/_tmp_$name"
    df.repartition(1).write.parquet(tmp)
    val part = new File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(t, "data"))
    val dst = Paths.get(t, "data", s"$name.parquet")
    Files.move(part.toPath, dst)
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
    dst.toString
  }

  private def manifestEntry(status: Int, path: String, content: Int = 0,
      fmt: String = "PARQUET"): Map[String, Any] =
    Map("status" -> status,
      "data_file" -> Map("content" -> content, "file_path" -> path,
        "file_format" -> fmt, "record_count" -> 1L))

  /** Write manifests + manifest list + vN.metadata.json for one
    * snapshot over `entries` (grouped into one manifest per content
    * kind), with `schemaFields` as the iceberg field JSON array body.
    */
  private def stageSnapshot(t: String, schemaFields: String,
      dataEntries: Seq[Map[String, Any]],
      deleteEntries: Seq[Map[String, Any]] = Seq.empty,
      version: Int = 1, formatVersion: Int = 2,
      writeHint: Boolean = true): Unit = {
    val mdir = s"$t/metadata"
    Files.createDirectories(Paths.get(mdir))
    val snapId = 7700L + version
    var mlRows = Seq(Map[String, Any](
      "manifest_path" -> s"$mdir/m$version-data.avro",
      "manifest_length" -> 1L, "content" -> 0, "added_snapshot_id" -> snapId))
    writeAvro(s"$mdir/m$version-data.avro", manifestEntrySchema, dataEntries)
    if (deleteEntries.nonEmpty) {
      writeAvro(s"$mdir/m$version-del.avro", manifestEntrySchema, deleteEntries)
      mlRows = mlRows :+ Map[String, Any](
        "manifest_path" -> s"$mdir/m$version-del.avro",
        "manifest_length" -> 1L, "content" -> 1, "added_snapshot_id" -> snapId)
    }
    writeAvro(s"$mdir/ml$version.avro", manifestListSchema, mlRows)
    val meta =
      s"""{"format-version":$formatVersion,"table-uuid":"u-$version",
         |"location":"$t","last-sequence-number":$version,
         |"current-snapshot-id":$snapId,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[$schemaFields]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"snapshots":[{"snapshot-id":$snapId,"sequence-number":$version,
         |"manifest-list":"file://$mdir/ml$version.avro"}]}""".stripMargin
    Files.writeString(Paths.get(mdir, s"v$version.metadata.json"), meta)
    if (writeHint)
      Files.writeString(Paths.get(mdir, "version-hint.text"), version.toString)
  }

  private val kvFields =
    """{"id":1,"name":"k","required":true,"type":"long"},
      |{"id":2,"name":"tag","required":false,"type":"string"},
      |{"id":3,"name":"x","required":false,"type":"double"}""".stripMargin

  test("v2 flat table: live set folds, schema maps, deleted entries drop") {
    import spark.implicits._
    val t = freshTable()
    val df = (1 to 30).map(i => (i.toLong, s"r$i", i * 1.5)).toDF("k", "tag", "x")
    val f0 = stageData(t, df.filter(col("k") <= 10), "f0")
    val f1 = stageData(t, df.filter(col("k") > 10 && col("k") <= 20), "f1")
    val f2 = stageData(t, df.filter(col("k") > 20), "f2")
    // f1 is DELETED (status=2): not part of the snapshot
    stageSnapshot(t, kvFields, Seq(
      manifestEntry(1, s"file://$f0"),
      manifestEntry(2, s"file://$f1"),
      manifestEntry(0, f2)))
    val (out, st) = IcebergImport.readIceberg(spark, t)
    assert(st.formatVersion == 2 && st.dataFiles.size == 2)
    assert(out.schema.fieldNames.toSeq == Seq("k", "tag", "x"))
    assert(!st.schema("k").nullable && st.schema("tag").nullable)
    assert(st.schema("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(out.as[(Long, String, Double)].collect().map(_._1).toSet ==
      ((1L to 10L) ++ (21L to 30L)).toSet)
  }

  test("position deletes mask exactly their rows via the anti-join") {
    import spark.implicits._
    val t = freshTable()
    val df = (1 to 40).map(i => (i.toLong, s"r$i", i * 1.5)).toDF("k", "tag", "x")
    val f0 = stageData(t, df.filter(col("k") <= 20).orderBy(col("k")), "f0")
    val f1 = stageData(t, df.filter(col("k") > 20).orderBy(col("k")), "f1")
    // delete positions 0,1,2 of f0 (k=1,2,3) and 5 of f1 (k=26);
    // the delete file references f0 by URI and f1 by plain path —
    // both must normalize onto _metadata.file_path
    val delPath = {
      val tmp = s"$t/_tmp_del"
      Seq((s"file://$f0", 0L), (s"file://$f0", 1L), (s"file://$f0", 2L),
        (f1, 5L))
        .toDF("file_path", "pos").repartition(1).write.parquet(tmp)
      val part = new File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(t, "data", "del0.parquet")
      Files.move(part.toPath, dst)
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      dst.toString
    }
    stageSnapshot(t, kvFields,
      Seq(manifestEntry(1, f0), manifestEntry(1, f1)),
      Seq(manifestEntry(1, delPath, content = 1)))
    val (out, st) = IcebergImport.readIceberg(spark, t)
    assert(st.posDeleteFiles.size == 1)
    val ks = out.select(col("k")).as[Long].collect().toSet
    assert(ks == ((4L to 25L) ++ (27L to 40L)).toSet)
    // import lands the VISIBLE rows in a graft table
    val gp = freshTable()
    IcebergImport.importIceberg(spark, t, gp, statsCols = Seq("k"))
    assert(GraftLake.read(spark, gp).count() == 36)
  }

  test("refusals: format v3, equality deletes, non-parquet, nested types, no snapshot") {
    import spark.implicits._
    val t1 = freshTable()
    val f = stageData(t1, Seq((1L, "a", 1.0)).toDF("k", "tag", "x"), "f0")
    stageSnapshot(t1, kvFields, Seq(manifestEntry(1, f)), formatVersion = 3)
    val e1 = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t1))
    assert(e1.getMessage.contains("format-version 3"))

    val t2 = freshTable()
    val f2 = stageData(t2, Seq((1L, "a", 1.0)).toDF("k", "tag", "x"), "f0")
    stageSnapshot(t2, kvFields, Seq(
      manifestEntry(1, f2), manifestEntry(1, f2, content = 2)))
    // a content=2 entry WITHOUT equality_ids is unreadable
    val e2 = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t2))
    assert(e2.getMessage.contains("equality_ids"))

    val t3 = freshTable()
    val f3 = stageData(t3, Seq((1L, "a", 1.0)).toDF("k", "tag", "x"), "f0")
    stageSnapshot(t3, kvFields, Seq(manifestEntry(1, f3, fmt = "ORC")))
    val e3 = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t3))
    assert(e3.getMessage.contains("parquet only"))

    val t4 = freshTable()
    val f4 = stageData(t4, Seq((1L, "a", 1.0)).toDF("k", "tag", "x"), "f0")
    stageSnapshot(t4,
      """{"id":1,"name":"k","required":true,"type":"long"},
        |{"id":2,"name":"pt","required":false,"type":
        |  {"type":"map","key":"string","value":"long",
        |   "key-id":5,"value-id":6,"value-required":false}}""".stripMargin,
      Seq(manifestEntry(1, f4)))
    val e4 = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t4))
    assert(e4.getMessage.contains("map type"))

    val t5 = freshTable()
    Files.createDirectories(Paths.get(t5, "metadata"))
    Files.writeString(Paths.get(t5, "metadata", "v1.metadata.json"),
      s"""{"format-version":2,"current-snapshot-id":-1,
         |"schemas":[{"schema-id":0,"fields":[$kvFields]}],
         |"current-schema-id":0,"snapshots":[]}""".stripMargin)
    Files.writeString(Paths.get(t5, "metadata", "version-hint.text"), "1")
    val e5 = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t5))
    assert(e5.getMessage.contains("no current snapshot"))
  }

  test("equality deletes: sequence-scoped, same-snapshot re-inserts survive; mixed id sets refuse") {
    import spark.implicits._
    import graft.sources.IcebergExport
    val t = freshTable()
    val df = (1 to 30).map(i => (i.toLong, s"r$i", i * 1.0)).toDF("k", "tag", "x")
    IcebergExport.exportIceberg(df.repartition(2, col("k")), t) // seq 1
    // delete k in 1..10 by equality on field id 1 (k); the SAME
    // snapshot re-inserts k in 1..5 — they survive (delete scopes to
    // strictly LOWER sequences)
    def onePart(d: org.apache.spark.sql.DataFrame, dst: String): Seq[String] = {
      val tmp = s"$t/_tmp_x"
      d.repartition(1).write.parquet(tmp)
      val part = new File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(dst).getParent)
      Files.move(part.toPath, Paths.get(dst))
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      Seq(dst)
    }
    val delF = onePart((1L to 10L).toDF("k"), s"$t/data/eqdel0.parquet")
    val reinsF = onePart(
      (1 to 5).map(i => (i.toLong, s"re$i", i * 2.0)).toDF("k", "tag", "x"),
      s"$t/data/reins0.parquet")
    IcebergImport // silence unused-import style
    IcebergExport.appendEqualityDeletes(spark, t, delF, Seq(1), reinsF)
    val (out, st) = IcebergImport.readIceberg(spark, t)
    assert(st.eqDeleteFiles.size == 1 && st.eqDeleteFiles.head._3 == Seq(1))
    val got = out.select(col("k"), col("tag")).as[(Long, String)]
      .collect().toSet
    val expect = ((11L to 30L).map(i => (i, s"r$i")) ++
      (1L to 5L).map(i => (i, s"re$i"))).toSet
    assert(got == expect)
    // position + equality deletes compose: pos-delete one surviving
    // re-inserted row, then re-fold
    val posF = onePart(Seq((s"$t/data/reins0.parquet", 0L))
      .toDF("file_path", "pos"), s"$t/data/posdel0.parquet")
    // learn which k sits at position 0 of the re-insert file
    val k0 = spark.read.parquet(s"$t/data/reins0.parquet")
      .select(col("k"), col("_metadata.row_index").as("p"))
      .filter(col("p") === 0L).head.getLong(0)
    IcebergExport.appendPositionDeletes(spark, t, posF)
    val (out2, _) = IcebergImport.readIceberg(spark, t)
    assert(out2.count() == 24)
    assert(!out2.select("k").as[Long].collect().contains(k0) ||
      (11L to 30L).contains(k0))

    // mixed equality_ids sets refuse loudly
    val t2 = freshTable()
    IcebergExport.exportIceberg(df.repartition(1), t2)
    val d1 = onePart((1L to 3L).toDF("k"), s"$t2/data/e1.parquet")
    IcebergExport.appendEqualityDeletes(spark, t2, d1, Seq(1))
    val d2 = onePart(Seq("r9").toDF("tag"), s"$t2/data/e2.parquet")
    IcebergExport.appendEqualityDeletes(spark, t2, d2, Seq(2))
    val e = intercept[IllegalArgumentException](
      IcebergImport.readIceberg(spark, t2))
    assert(e.getMessage.contains("MIXED equality_ids"))
  }

  test("metadata resolution: version-hint wins; highest vN without it; v1 single-schema reads") {
    import spark.implicits._
    val t = freshTable()
    val df = (1 to 10).map(i => (i.toLong, s"r$i", 0.0)).toDF("k", "tag", "x")
    val f0 = stageData(t, df.filter(col("k") <= 5), "f0")
    val f1 = stageData(t, df, "f1")
    // v1 names f0 only; v2 names f1 only — the hint pins v1
    stageSnapshot(t, kvFields, Seq(manifestEntry(1, f0)), version = 1)
    stageSnapshot(t, kvFields, Seq(manifestEntry(1, f1)), version = 2,
      writeHint = false)
    Files.writeString(Paths.get(t, "metadata", "version-hint.text"), "1")
    assert(IcebergImport.readIceberg(spark, t)._1.count() == 5)
    // without the hint, the highest vN wins
    Files.delete(Paths.get(t, "metadata", "version-hint.text"))
    assert(IcebergImport.readIceberg(spark, t)._1.count() == 10)
    // format v1 metadata: single "schema", no manifest content field
    val t2 = freshTable()
    val g0 = stageData(t2, df, "f0")
    val mdir = s"$t2/metadata"
    Files.createDirectories(Paths.get(mdir))
    writeAvro(s"$mdir/m1.avro", manifestEntrySchema,
      Seq(manifestEntry(1, g0)))
    // v1 manifest-list rows have no `content` field
    writeAvro(s"$mdir/ml1.avro",
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin,
      Seq(Map[String, Any]("manifest_path" -> s"$mdir/m1.avro",
        "manifest_length" -> 1L, "added_snapshot_id" -> 9L)))
    Files.writeString(Paths.get(mdir, "v1.metadata.json"),
      s"""{"format-version":1,"location":"$t2","current-snapshot-id":9,
         |"schema":{"type":"struct","fields":[$kvFields]},
         |"partition-spec":[],
         |"snapshots":[{"snapshot-id":9,"manifest-list":"$mdir/ml1.avro"}]}"""
        .stripMargin)
    Files.writeString(Paths.get(mdir, "version-hint.text"), "1")
    val (out, st) = IcebergImport.readIceberg(spark, t2)
    assert(st.formatVersion == 1 && out.count() == 10)
  }

  test("temporal/decimal/float types round-trip export -> import exactly") {
    import spark.implicits._
    val t = freshTable()
    val df = spark.sql(
      """SELECT id,
        |  CAST(date_add(DATE '1994-01-05', CAST(id AS INT)) AS DATE) AS d,
        |  CAST(timestamp_ntz'1996-03-04 12:30:00' + make_interval(0,0,0,0,0,0,id) AS TIMESTAMP_NTZ) AS ts,
        |  CAST(id * 1.25 AS DECIMAL(10,4)) AS dec,
        |  CAST(id AS FLOAT) AS f,
        |  CAST(id % 2 = 0 AS BOOLEAN) AS b
        |FROM range(1, 21)""".stripMargin)
    graft.sources.IcebergExport.exportIceberg(df.repartition(2), t)
    val (out, st) = IcebergImport.readIceberg(spark, t)
    // the metadata chain re-derives the exact Spark types
    import org.apache.spark.sql.types._
    assert(st.schema("d").dataType == DateType)
    assert(st.schema("ts").dataType == TimestampNTZType)
    assert(st.schema("dec").dataType == DecimalType(10, 4))
    assert(st.schema("f").dataType == FloatType)
    assert(st.schema("b").dataType == BooleanType)
    val got = out.orderBy(col("id")).collect()
    val want = df.orderBy(col("id")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("nested struct and list columns import value-exact; map refuses") {
    import spark.implicits._
    val t = freshTable()
    val df = spark.sql(
      """SELECT id AS k,
        |  named_struct('s', concat('v', id), 'n', id * 2) AS st,
        |  array(id, id + 1, id + 2) AS xs
        |FROM range(1, 21)""".stripMargin)
    val f0 = stageData(t, df, "f0")
    stageSnapshot(t,
      """{"id":1,"name":"k","required":true,"type":"long"},
        |{"id":2,"name":"st","required":false,"type":{"type":"struct","fields":[
        |  {"id":4,"name":"s","required":false,"type":"string"},
        |  {"id":5,"name":"n","required":false,"type":"long"}]}},
        |{"id":3,"name":"xs","required":false,"type":
        |  {"type":"list","element-id":6,"element":"long","element-required":true}}"""
        .stripMargin,
      Seq(manifestEntry(1, f0)))
    val (out, st) = IcebergImport.readIceberg(spark, t)
    import org.apache.spark.sql.types._
    assert(st.schema("st").dataType.isInstanceOf[StructType])
    assert(st.schema("st").dataType.asInstanceOf[StructType]("n").dataType
      == LongType)
    assert(st.schema("xs").dataType == ArrayType(LongType, containsNull = false))
    val got = out.orderBy(col("k")).collect().toSeq
    val want = df.orderBy(col("k")).collect().toSeq
    assert(got == want)
  }

  test("partition transforms match the spec's published vectors") {
    import graft.sources.IcebergImport.IcebergTransforms
    // murmur3_x86_32 bucket-hash vectors pinned in the Iceberg table
    // spec, Appendix B
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    assert(IcebergTransforms.murmur3("iceberg".getBytes("UTF-8"))
      == 1210000089)
    val d = java.time.LocalDate.of(2017, 11, 16)
    assert(IcebergTransforms.hashLong(d.toEpochDay) == -653330422)
    // bucket[16] of int 34: (2017239379 & Int.MaxValue) % 16
    assert(IcebergTransforms("bucket[16]", 34L) ==
      Some((2017239379L & Int.MaxValue) % 16))
    assert(IcebergTransforms("truncate[10]", 27L) == Some(20L))
    assert(IcebergTransforms("truncate[10]", -3L) == Some(-10L))
    assert(IcebergTransforms("truncate[3]", "icebergs") == Some("ice"))
    assert(IcebergTransforms("days", d) == Some(d.toEpochDay))
    assert(IcebergTransforms("months", d) == Some(((2017 - 1970) * 12 + 10).toLong))
    assert(IcebergTransforms("years", d) == Some(47L))
    assert(IcebergTransforms("void", 5L) == None)
    assert(IcebergTransforms("identity", "x") == Some("x"))
  }

  test("identity-partitioned export: manifest partition values drive file pruning; hive columns re-inject") {
    import spark.implicits._
    import graft.sources.IcebergExport
    val t = freshTable()
    val df = (1 to 60).map(i => (i.toLong, i % 4, s"r$i")).toDF("k", "p", "tag")
    IcebergExport.exportIceberg(df.repartition(2), t, partitionBy = Seq("p"))
    val st0 = IcebergImport.foldIceberg(t)
    assert(st0.partSpec.map(f => (f.name, f.transform)) ==
      Seq(("p", "identity")))
    // every data file carries its manifest-recorded partition value
    assert(st0.dataFiles.nonEmpty &&
      st0.dataFiles.forall(f => st0.dataFilePartitions(f).contains("p")))
    // prune to p = 2: strictly fewer files scanned, rows exact, and
    // the hive-dropped partition column re-injects typed
    val (out, st) = IcebergImport.readIcebergPruned(spark, t, Seq("p" -> 2))
    assert(st.dataFiles.nonEmpty && st.dataFiles.size < st0.dataFiles.size)
    assert(st.dataFiles.forall(f =>
      st0.dataFilePartitions(f)("p") == 2L))
    val got = out.select(col("k"), col("p"), col("tag"))
      .as[(Long, Int, String)].collect().toSet
    val want = (1 to 60).filter(_ % 4 == 2)
      .map(i => (i.toLong, 2, s"r$i")).toSet
    assert(got == want)
    // the UNPRUNED read also re-injects and returns everything
    val (all, _) = IcebergImport.readIceberg(spark, t)
    assert(all.count() == 60)
    assert(all.select(sum(col("p"))).head.getLong(0) ==
      (1 to 60).map(_ % 4).sum.toLong)
  }

  test("bucket/days-partitioned manifests prune by transform value") {
    import spark.implicits._
    val t = freshTable()
    val df = (1 to 40).map(i => (i.toLong, s"r$i", 0.0)).toDF("k", "tag", "x")
    // two files: k 1..20 and 21..40; hand-write manifests recording
    // bucket[8](min k of file) — entries carry a partition record
    val f0 = stageData(t, df.filter(col("k") <= 20), "f0")
    val f1 = stageData(t, df.filter(col("k") > 20), "f1")
    import graft.sources.IcebergImport.IcebergTransforms
    def b8(v: Long): Int =
      IcebergTransforms("bucket[8]", v).get.asInstanceOf[Long].toInt
    // pretend all rows of f0 hash to b8(5) and f1 to b8(25) — for the
    // PRUNE test only the recorded values matter
    val entrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |    {"name":"k_bucket","type":["null","int"],"default":null}]}},
        |  {"name":"record_count","type":"long"}]}}]}""".stripMargin
    val mdir = s"$t/metadata"
    Files.createDirectories(Paths.get(mdir))
    writeAvro(s"$mdir/m1.avro", entrySchema, Seq(
      Map("status" -> 1, "data_file" -> Map("content" -> 0,
        "file_path" -> f0, "file_format" -> "PARQUET",
        "partition" -> Map("k_bucket" -> b8(5L)), "record_count" -> 20L)),
      Map("status" -> 1, "data_file" -> Map("content" -> 0,
        "file_path" -> f1, "file_format" -> "PARQUET",
        "partition" -> Map("k_bucket" -> b8(25L)), "record_count" -> 20L))))
    writeAvro(s"$mdir/ml1.avro", manifestListSchema,
      Seq(Map[String, Any]("manifest_path" -> s"$mdir/m1.avro",
        "manifest_length" -> 1L, "content" -> 0,
        "added_snapshot_id" -> 7701L)))
    Files.writeString(Paths.get(mdir, "v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"u-1","location":"$t",
         |"last-sequence-number":1,"current-snapshot-id":7701,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[$kvFields]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |  {"name":"k_bucket","transform":"bucket[8]","source-id":1,"field-id":1000}]}],
         |"default-spec-id":0,
         |"snapshots":[{"snapshot-id":7701,"sequence-number":1,
         |"manifest-list":"$mdir/ml1.avro"}]}""".stripMargin)
    Files.writeString(Paths.get(mdir, "version-hint.text"), "1")
    // a predicate k = 25 maps through bucket[8]; only files whose
    // recorded bucket matches b8(25) survive the manifest prune
    assume(b8(5L) != b8(25L)) // the vectors differ for these keys
    val (out, st) = IcebergImport.readIcebergPruned(spark, t, Seq("k" -> 25L))
    assert(st.dataFiles == Seq(f1))
    import spark.implicits._
    assert(out.select("k").as[Long].collect().toSeq == Seq(25L))
  }

  test("DATE identity partitioning: epoch-day values in the manifest, typed re-injection, day prune") {
    import spark.implicits._
    val t = freshTable()
    val df = spark.sql(
      """SELECT id AS k,
        |  date_add(DATE '2020-03-01', CAST(id % 3 AS INT)) AS d,
        |  concat('r', id) AS tag
        |FROM range(1, 31)""".stripMargin)
    graft.sources.IcebergExport.exportIceberg(df, t, partitionBy = Seq("d"))
    val st0 = IcebergImport.foldIceberg(t)
    // the manifest records epoch days (the iceberg date representation)
    val want = java.time.LocalDate.of(2020, 3, 1).toEpochDay
    assert(st0.dataFiles.nonEmpty)
    assert(st0.dataFiles.flatMap(f =>
      st0.dataFilePartitions(f).get("d")).map(_.asInstanceOf[Long]).toSet ==
      Set(want, want + 1, want + 2))
    // prune by a DATE predicate value; the hive-dropped column
    // re-injects as a real DateType column
    val day = java.sql.Date.valueOf("2020-03-02")
    val (out, st) = IcebergImport.readIcebergPruned(spark, t, Seq("d" -> day))
    assert(st.dataFiles.size < st0.dataFiles.size)
    assert(out.schema("d").dataType == org.apache.spark.sql.types.DateType)
    val got = out.select("k", "d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    val expect = (1L to 30L).filter(_ % 3 == 1)
      .map(k => (k, "2020-03-02")).toSet
    assert(got == expect)
  }

  test("export writes spec-grade metadata: header kv, field-ids, parseable UUID, partition struct") {
    import spark.implicits._
    import graft.sources.IcebergExport
    val t = freshTable()
    val df = (1 to 12).map(i => (i.toLong, i % 3, s"r$i")).toDF("k", "p", "tag")
    IcebergExport.exportIceberg(df.repartition(1), t, partitionBy = Seq("p"))
    // manifest header metadata per the spec
    val mdir = Paths.get(t, "metadata")
    import scala.jdk.CollectionConverters._
    val manifest = Files.list(mdir).iterator().asScala
      .find(_.getFileName.toString.startsWith("m0-data")).get
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      manifest.toFile,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    assert(r.getMetaString("format-version") == "2")
    assert(r.getMetaString("content") == "data")
    assert(r.getMetaString("schema").contains("\"schema-id\":0"))
    assert(r.getMetaString("partition-spec").contains("\"transform\":\"identity\""))
    // Avro field-id annotations: readers resolve manifest fields by id
    val sch = r.getSchema
    assert(sch.getField("status").getObjectProp("field-id") == 0)
    assert(sch.getField("data_file").getObjectProp("field-id") == 2)
    val dfs = sch.getField("data_file").schema()
    assert(dfs.getField("file_path").getObjectProp("field-id") == 100)
    assert(dfs.getField("partition").getObjectProp("field-id") == 102)
    // the r102 partition record carries the partition value
    val entry = r.iterator().asScala.next()
    val part = entry.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(part.getSchema.getFields.asScala.map(_.name()).toSeq == Seq("p"))
    r.close()
    // table-uuid parses as a real UUID, deterministically
    val metaJson = Files.readString(mdir.resolve("v1.metadata.json"))
    val uuid = """"table-uuid":"([^"]+)"""".r
      .findFirstMatchIn(metaJson).get.group(1)
    assert(java.util.UUID.fromString(uuid) ==
      java.util.UUID.nameUUIDFromBytes(t.getBytes("UTF-8")))
  }

  test("import-side time travel: AS OF an earlier snapshot skips later deletes") {
    import spark.implicits._
    import graft.sources.{IcebergExport, GraftLake}
    val t = freshTable()
    val df = (1 to 30).map(i => (i.toLong, s"r$i", 0.0)).toDF("k", "tag", "x")
    IcebergExport.exportIceberg(df.repartition(1), t) // snapshot 1
    def onePart(d: org.apache.spark.sql.DataFrame, dst: String): Seq[String] = {
      val tmp = s"$t/_tmp_x"
      d.repartition(1).write.parquet(tmp)
      val part = new File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(dst).getParent)
      Files.move(part.toPath, Paths.get(dst))
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      Seq(dst)
    }
    val delF = onePart((1L to 10L).toDF("k"), s"$t/data/eqdel0.parquet")
    IcebergExport.appendEqualityDeletes(spark, t, delF, Seq(1)) // snapshot 2
    // head reads 20 rows; AS OF snapshot 1 reads all 30
    assert(IcebergImport.readIceberg(spark, t)._1.count() == 20)
    val (v1, st1) = IcebergImport.readIceberg(spark, t, Some(1L))
    assert(st1.snapshotId == 1L && v1.count() == 30)
    // importIceberg AS OF lands the old rows in a graft table
    val gp = freshTable()
    IcebergImport.importIceberg(spark, t, gp, asOfSnapshotId = Some(1L))
    assert(GraftLake.read(spark, gp).count() == 30)
    // an unknown snapshot id refuses with the list of live ones
    val e = intercept[IllegalArgumentException](
      IcebergImport.foldIceberg(t, Some(99L)))
    assert(e.getMessage.contains("not in the metadata snapshot list"))
  }

  test("delete-only snapshots keep sequence numbers strictly monotonic") {
    import spark.implicits._
    import graft.sources.IcebergExport
    val t = freshTable()
    val df = (1 to 20).map(i => (i.toLong, s"r$i", 0.0)).toDF("k", "tag", "x")
    IcebergExport.exportIceberg(df.repartition(1), t) // seq 1
    def onePart(d: org.apache.spark.sql.DataFrame, dst: String): Seq[String] = {
      val tmp = s"$t/_tmp_x"
      d.repartition(1).write.parquet(tmp)
      val part = new File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(dst).getParent)
      Files.move(part.toPath, Paths.get(dst))
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      Seq(dst)
    }
    // DELETE-ONLY snapshot at seq 2 (no new data file)
    val d1 = onePart((1L to 5L).toDF("k"), s"$t/data/e1.parquet")
    IcebergExport.appendEqualityDeletes(spark, t, d1, Seq(1))
    val st2 = IcebergImport.foldIceberg(t)
    assert(st2.lastSequenceNumber == 2L)
    assert(st2.eqDeleteFiles.map(_._2) == Seq(2L))
    // the NEXT delete-only snapshot must take seq 3, never reuse 2
    val d2 = onePart((6L to 8L).toDF("k"), s"$t/data/e2.parquet")
    IcebergExport.appendEqualityDeletes(spark, t, d2, Seq(1))
    val st3 = IcebergImport.foldIceberg(t)
    assert(st3.lastSequenceNumber == 3L)
    assert(st3.eqDeleteFiles.map(_._2).sorted == Seq(2L, 3L))
    // all three delete waves apply: rows 9..20 remain
    import spark.implicits._
    val (out, _) = IcebergImport.readIceberg(spark, t)
    assert(out.select("k").as[Long].collect().toSet == (9L to 20L).toSet)
  }

  test("torn metadata.json refuses with the offset diagnostic, never a raw index error") {
    val good = """{"format-version":2,"snapshots":[{"snapshot-id":1}]}"""
    for (cut <- Seq(5, 20, good.length - 1)) {
      val e = intercept[IllegalArgumentException](
        IcebergImport.parseJson(good.take(cut)))
      assert(e.getMessage.contains("bad JSON at offset"))
    }
    val e2 = intercept[IllegalArgumentException](
      IcebergImport.parseJson("""{"a":"unterminated"""))
    assert(e2.getMessage.contains("bad JSON at offset"))
    val e3 = intercept[IllegalArgumentException](
      IcebergImport.parseJson("""{"a":"esc\"""))
    assert(e3.getMessage.contains("bad JSON at offset"))
  }

  test("real-warehouse metadata naming (00001-uuid.metadata.json) resolves to the latest") {
    import spark.implicits._
    val t = freshTable()
    val df = (1 to 10).map(i => (i.toLong, s"r$i", 0.0)).toDF("k", "tag", "x")
    val f0 = stageData(t, df.filter(col("k") <= 4), "f0")
    val f1 = stageData(t, df, "f1")
    // stage two snapshots under vN names, then RENAME to the
    // sequence-prefixed uuid form engines actually write (no hint)
    stageSnapshot(t, kvFields, Seq(manifestEntry(1, f0)), version = 1,
      writeHint = false)
    stageSnapshot(t, kvFields, Seq(manifestEntry(1, f1)), version = 2,
      writeHint = false)
    val mdir = Paths.get(t, "metadata")
    Files.move(mdir.resolve("v1.metadata.json"),
      mdir.resolve("00001-aaaa1111-2222-4333-8444-555566667777.metadata.json"))
    Files.move(mdir.resolve("v2.metadata.json"),
      mdir.resolve("00002-bbbb1111-2222-4333-8444-555566667777.metadata.json"))
    // lexicographically-last wins = the highest sequence prefix
    assert(IcebergImport.readIceberg(spark, t)._1.count() == 10)
  }
}
