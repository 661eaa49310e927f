package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaImport, GraftLake}

/** Delta-log fold + import: the public-protocol JSON actions
  * reconcile to the right active set, partition values re-inject from
  * the log, non-integral partition layouts import flat with prunable
  * stats, and every unsupported protocol feature refuses loudly.
  */
class DeltaImportSpec extends AnyFunSuite with SparkSpec {

  private def freshDelta(): String =
    Files.createTempDirectory("graft-delta").resolve("d").toString

  private def jesc(x: String) =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Write one single-file parquet of `df` as `<delta>/<name>.parquet`. */
  private def stage(delta: String, df: org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    val tmp = s"$delta/_tmp_$name"
    df.repartition(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(delta, s"$name.parquet"))
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
  }

  private def writeLog(delta: String, version: Int, lines: Seq[String]): Unit =
    Files.writeString(
      Paths.get(delta, "_delta_log", f"$version%020d.json"),
      lines.mkString("", "\n", "\n"))

  /** Flat 2-version table: v0 adds f0+f1, v1 removes f1 and adds f2. */
  private def seedFlat(delta: String): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    val df = (1 to 30).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    stage(delta, df.filter(col("id") <= 10), "f0")
    stage(delta, df.filter(col("id") > 10 && col("id") <= 20), "f1")
    stage(delta, df.filter(col("id") > 20), "f2")
    val schemaJson = jesc(df.schema.json)
    writeLog(delta, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    writeLog(delta, 1, Seq(
      """{"remove":{"path":"f1.parquet","dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
  }

  test("add/remove reconciliation: live set is v0's survivors plus v1's add") {
    val delta = freshDelta()
    seedFlat(delta)
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.partitionCols.isEmpty)
    assert(st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f2.parquet"))
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == ((1L to 10L) ++ (21L to 30L)))
  }

  test("string-partitioned source imports FLAT with stats on the partition column") {
    import spark.implicits._
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    // data files DO NOT carry the partition column — only the log does
    val full = (1 to 20).map(i =>
      (i.toLong, if (i <= 10) "red" else "blue")).toDF("id", "color")
    stage(delta, full.filter(col("color") === "red").drop("color"), "red0")
    stage(delta, full.filter(col("color") === "blue").drop("color"), "blue0")
    val schemaJson = jesc(full.schema.json)
    writeLog(delta, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":["color"],"configuration":{}}}""",
      """{"add":{"path":"red0.parquet","partitionValues":{"color":"red"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"blue0.parquet","partitionValues":{"color":"blue"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val gp = Files.createTempDirectory("graft-delta-imp").resolve("t").toString
    DeltaImport.importDelta(spark, delta, gp, statsCols = Seq("id"))
    val got = GraftLake.read(spark, gp)
    assert(got.count() == 20)
    // the log-only partition values came back as a real column
    assert(got.filter(col("color") === "red").agg(max(col("id")))
      .head.getLong(0) == 10L)
    // flat import recorded prunable stats on the partition column
    assert(GraftLake.snapshot(gp).live.forall(_.statsFor("color").nonEmpty))
  }

  // -- checkpoint machinery -------------------------------------------

  /** Write a classic checkpoint parquet (the columnar twin of the JSON
    * actions) as `<v>.checkpoint.parquet` (+ `_last_checkpoint`),
    * with the given live adds and optional protocol/DV rows.
    */
  private def writeCheckpoint(delta: String, version: Long,
      schemaJson: String, partCols: Seq[String],
      adds: Seq[(String, Map[String, String])],
      minReader: Int = 1, addDv: Boolean = false,
      expiredRemoves: Seq[String] = Seq.empty,
      parts: Option[Int] = None): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dvType = StructType(Seq(
      StructField("storageType", StringType), StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType), StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val schema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("deletionVector", dvType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType))))))
    val dv = if (addDv) Row("u", "x", 1, 1, 1L) else null
    val rows: Seq[Row] =
      Seq(Row(Row(minReader, 2), null, null, null),
        Row(null, Row("m", schemaJson, partCols, Map.empty[String, String]),
          null, null)) ++
      adds.map { case (p, pv) =>
        Row(null, null, Row(p, pv, 1L, 0L, true, dv), null) } ++
      expiredRemoves.map(p => Row(null, null, null, Row(p, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts.getOrElse(1)), schema)
    val tmp = s"$delta/_tmp_cp"
    (parts match {
      case None => df.repartition(1)
      case Some(n) => df.repartition(n)
    }).write.parquet(tmp)
    val pieces = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts match {
      case None =>
        Files.move(pieces.head.toPath,
          Paths.get(delta, "_delta_log", f"$version%020d.checkpoint.parquet"))
      case Some(n) =>
        pieces.zipWithIndex.foreach { case (f, i) =>
          Files.move(f.toPath, Paths.get(delta, "_delta_log",
            f"$version%020d.checkpoint.${i + 1}%010d.$n%010d.parquet"))
        }
    }
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
    val partsJson = parts.map(n => s""","parts":$n""").getOrElse("")
    Files.writeString(Paths.get(delta, "_delta_log", "_last_checkpoint"),
      s"""{"version":$version,"size":${rows.size}$partsJson}""")
  }

  test("checkpointed log: checkpoint adds + JSON suffix reconcile; truncated prefix is fine") {
    val delta = freshDelta()
    seedFlat(delta)
    val schemaJson = {
      import spark.implicits._
      (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").schema.json
    }
    // checkpoint at v1 bakes the live set {f0, f2}; an expired remove
    // tombstone for f1 must have NO file effect
    writeCheckpoint(delta, 1L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty, "f2.parquet" -> Map.empty),
      expiredRemoves = Seq("f1.parquet"))
    // the vacuumed-prefix shape every real table reaches: JSON <= v1 gone
    Files.delete(Paths.get(delta, "_delta_log", "0" * 20 + ".json"))
    Files.delete(Paths.get(delta, "_delta_log", "0" * 19 + "1.json"))
    // a JSON commit AFTER the checkpoint still applies on top
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"f2.parquet","dataChange":true}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f1.parquet"))
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 20L))
  }

  test("multi-part checkpoint reads all parts; missing part refuses as incomplete") {
    val delta = freshDelta()
    seedFlat(delta)
    val schemaJson = {
      import spark.implicits._
      (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").schema.json
    }
    writeCheckpoint(delta, 1L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty, "f2.parquet" -> Map.empty),
      parts = Some(2))
    Files.delete(Paths.get(delta, "_delta_log", "0" * 20 + ".json"))
    Files.delete(Paths.get(delta, "_delta_log", "0" * 19 + "1.json"))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f2.parquet"))
    assert(df.count() == 20)
    // a part vanishes -> the classic naming probe fails loudly
    // (and no UUID-named v2 manifest exists to fall back to)
    Files.delete(Paths.get(delta, "_delta_log",
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta))
    assert(e.getMessage.contains("incomplete checkpoint"))
  }

  test("checkpoint rows with unknown features or malformed DVs refuse loudly") {
    val schemaJson = {
      import spark.implicits._
      (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").schema.json
    }
    val deltaA = freshDelta()
    seedFlat(deltaA)
    writeCheckpoint(deltaA, 1L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty), minReader = 3)
    val e1 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, deltaA))
    assert(e1.getMessage.contains("readerFeatures"))
    val deltaB = freshDelta()
    seedFlat(deltaB)
    // the checkpoint DV descriptor parses, but its malformed z85
    // payload must fail loudly (a skipped DV resurrects rows)
    writeCheckpoint(deltaB, 1L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty), addDv = true)
    val e2 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, deltaB))
    assert(e2.getMessage.contains("DV uuid payload too short"))
    // gap AFTER the checkpoint still refuses (non-contiguous suffix)
    val deltaC = freshDelta()
    seedFlat(deltaC)
    writeCheckpoint(deltaC, 0L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty))
    Files.delete(Paths.get(deltaC, "_delta_log", "0" * 19 + "1.json"))
    writeLog(deltaC, 2, Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val e3 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, deltaC))
    assert(e3.getMessage.contains("non-contiguous"))
  }

  test("unknown reader features and unresolvable DVs refuse loudly") {
    // reader features beyond what this import speaks
    val delta2 = freshDelta()
    seedFlat(delta2)
    writeLog(delta2, 2, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["unknownFutureFeature"]}}"""))
    val e2 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta2))
    assert(e2.getMessage.contains("unknownFutureFeature"))
    // a DV whose file is gone must fail loudly, never resurrect rows
    val delta3 = freshDelta()
    seedFlat(delta3)
    val uuidZ85 = DeltaImport.z85Encode(Array.fill[Byte](16)(7))
    writeLog(delta3, 2, Seq(
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$uuidZ85","offset":1,"sizeInBytes":1,"cardinality":1}}}"""))
    val e3 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta3))
    assert(e3.getMessage.contains("deletion vector file missing"))
    // non-contiguous versions (vacuumed/checkpoint-truncated prefix)
    val delta4 = freshDelta()
    seedFlat(delta4)
    Files.delete(Paths.get(delta4, "_delta_log", "0" * 20 + ".json"))
    val e4 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta4))
    assert(e4.getMessage.contains("non-contiguous"))
  }

  test("roaring/z85 round-trip: array, bitmap, multi-word containers") {
    // array container + high-bit second bitmap
    val a = Seq(0L, 3L, 65535L, 65536L, 131072L + 5L, (1L << 32) + 9L)
    assert(DeltaImport.roaringArrayPositions(
      DeltaImport.serializeRoaringArray(a)).toSeq == a.sorted)
    // dense container (> 4096 values) forces the bitmap form
    val dense = (0L until 5000L) ++ Seq(70000L)
    assert(DeltaImport.roaringArrayPositions(
      DeltaImport.serializeRoaringArray(dense)).toSeq == dense.sorted)
    // z85 is the exact ZeroMQ alphabet ("HelloWorld" test vector)
    assert(DeltaImport.z85Encode(Array(0x86.toByte, 0x4f.toByte,
      0xd2.toByte, 0x6f.toByte, 0xb5.toByte, 0x59.toByte,
      0xf7.toByte, 0x5b.toByte)) == "HelloWorld")
    assert(DeltaImport.z85Decode("HelloWorld").toSeq ==
      Seq(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte))
  }

  test("deletion vectors: inline and file-backed DVs mask exactly their positions") {
    import spark.implicits._
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    // f0: ids 1..20; f1: ids 21..40 (file order learned below — the
    // DV indexes ROW POSITIONS, not values)
    val df = (1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    stage(delta, df.filter(col("id") <= 20), "f0")
    stage(delta, df.filter(col("id") > 20), "f1")
    def posOf(name: String, ids: Set[Long]): Seq[Long] =
      spark.read.parquet(s"$delta/$name.parquet")
        .select(col("_metadata.row_index").as("p"), col("id")).collect()
        .filter(r => ids(r.getLong(1))).map(_.getLong(0)).toSeq.sorted
    // inline DV on f0: drop ids 1, 4, 20 by their file positions
    val pos0 = posOf("f0", Set(1L, 4L, 20L))
    val inlData = DeltaImport.serializeRoaringArray(pos0)
    val inl = DeltaImport.z85Encode(
      inlData ++ Array.fill[Byte]((4 - inlData.length % 4) % 4)(0))
    val inlSize = inlData.length
    // file-backed DV on f1: drop ids 26, 27; public blob layout:
    // version byte, BE size, data, BE crc32
    val data = DeltaImport.serializeRoaringArray(posOf("f1", Set(26L, 27L)))
    val crc = new java.util.zip.CRC32; crc.update(data)
    val uuid = java.util.UUID.randomUUID()
    val ub = java.nio.ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val blob = java.nio.ByteBuffer.allocate(1 + 4 + data.length + 4)
    blob.put(1.toByte); blob.putInt(data.length); blob.put(data)
    blob.putInt(crc.getValue.toInt)
    Files.write(Paths.get(delta, s"deletion_vector_$uuid.bin"), blob.array())
    val uuidZ85 = DeltaImport.z85Encode(ub.array())
    val schemaJson = jesc(df.schema.json)
    writeLog(delta, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inl","sizeInBytes":$inlSize,"cardinality":3}}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$uuidZ85","offset":1,"sizeInBytes":${data.length},"cardinality":2}}}"""))
    val (out, st) = DeltaImport.readDelta(spark, delta)
    assert(st.deletes("f0.parquet").toSeq == pos0)
    val ids = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((1L to 40L).toSet -- Set(1L, 4L, 20L, 26L, 27L)).toSeq.sorted)
    // a DV-less re-add clears the mask
    writeLog(delta, 1, Seq(
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (out2, st2) = DeltaImport.readDelta(spark, delta)
    assert(!st2.deletes.contains("f0.parquet"))
    assert(out2.count() == 38)
    // a RANDOM-PREFIXED 'u' descriptor: only the last 20 chars are
    // the z85 uuid; the prefix (any length, here 3 — not a multiple
    // of 5) is a literal subdirectory
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"f1.parquet","dataChange":true}}"""))
    Files.createDirectories(Paths.get(delta, "ab1"))
    Files.copy(Paths.get(delta, s"deletion_vector_$uuid.bin"),
      Paths.get(delta, "ab1", s"deletion_vector_$uuid.bin"))
    writeLog(delta, 3, Seq(
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab1$uuidZ85","offset":1,"sizeInBytes":${data.length},"cardinality":2}}}"""))
    val (out3, _) = DeltaImport.readDelta(spark, delta)
    assert(out3.count() == 38) // f0 unmasked (v1), f1 re-masked via prefix dir
    // a corrupted blob (the one now referenced) fails its crc loudly
    val f = Paths.get(delta, "ab1", s"deletion_vector_$uuid.bin")
    val bytes = Files.readAllBytes(f)
    bytes(7) = (bytes(7) ^ 0x1).toByte
    Files.write(f, bytes)
    val e = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta))
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("action classification is by the top-level key, never a substring") {
    val delta = freshDelta()
    seedFlat(delta)
    // a REMOVE whose nested fields contain the text "add" (a real
    // remove carries extendedFileMetadata partitionValues/tags) must
    // still remove — substring classification would resurrect f0
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"f0.parquet","dataChange":true,"extendedFileMetadata":true,"partitionValues":{"kind":"add"},"tags":{"op":"add"}}}"""))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.map(_._1) == Seq("f2.parquet"))
    assert(df.count() == 10)
  }

  test("partition values containing '}' / '{' survive the string-aware scan") {
    import spark.implicits._
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    val full = (1 to 10).map(i =>
      (i.toLong, if (i <= 5) "a}b{c" else "plain")).toDF("id", "grp")
    stage(delta, full.filter(col("grp") === "a}b{c").drop("grp"), "g0")
    stage(delta, full.filter(col("grp") === "plain").drop("grp"), "g1")
    val schemaJson = jesc(full.schema.json)
    writeLog(delta, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":["grp"],"configuration":{}}}""",
      // a brace-bounded regex would truncate this at the '}' INSIDE
      // the value, dropping the pair and corrupting the re-injection
      """{"add":{"path":"g0.parquet","partitionValues":{"grp":"a}b{c"},"size":1,"modificationTime":0,"dataChange":true,"tags":{"t":"x"}}}""",
      """{"add":{"path":"g1.parquet","partitionValues":{"grp":"plain"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.toMap.apply("g0.parquet") == Map("grp" -> "a}b{c"))
    assert(df.filter(col("grp") === "a}b{c").count() == 5)
    assert(df.filter(col("grp") === "plain").count() == 5)
    // the scanner itself: nested braces + escaped quotes + absent key
    assert(DeltaImport.partValsBody(
      """{"add":{"path":"p","partitionValues":{"k":"v}w","j":"x\"y}z"},"size":1}}""")
      .contains(""""k":"v}w","j":"x\"y}z""""))
    assert(DeltaImport.partValsBody("""{"remove":{"path":"p"}}""").isEmpty)
  }

  test("column mapping (name mode): physical file names restore to logical; id mode refuses") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    def mapped(name: String, phys: String, id: Int, dt: DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id.toLong).build())
    val logical = StructType(Seq(
      mapped("id", "col-aaa111", 1, LongType),
      mapped("tag", "col-bbb222", 2, StringType),
      mapped("grp", "col-ccc333", 3, StringType)))
    // data files carry PHYSICAL names; the partition column is absent
    val full = (1 to 20).map(i =>
      (i.toLong, s"r$i", if (i <= 10) "x" else "y")).toDF("id", "tag", "grp")
    stage(delta, full.filter(col("grp") === "x")
      .select(col("id").as("col-aaa111"), col("tag").as("col-bbb222")), "px")
    stage(delta, full.filter(col("grp") === "y")
      .select(col("id").as("col-aaa111"), col("tag").as("col-bbb222")), "py")
    val schemaJson = jesc(logical.json)
    writeLog(delta, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":["grp"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}}}""",
      // partitionValues keyed by the PHYSICAL name, per the protocol
      """{"add":{"path":"px.parquet","partitionValues":{"col-ccc333":"x"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"py.parquet","partitionValues":{"col-ccc333":"y"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.config("delta.columnMapping.mode") == "name")
    assert(df.columns.toSeq == Seq("id", "tag", "grp"))
    assert(df.filter(col("grp") === "x").agg(max(col("id")))
      .head.getLong(0) == 10L)
    assert(df.count() == 20)
    // a protocol-v3 table whose ONLY reader feature is columnMapping
    // also imports
    val delta3 = freshDelta()
    Files.createDirectories(Paths.get(delta3, "_delta_log"))
    stage(delta3, full.select(col("id").as("col-aaa111"),
      col("tag").as("col-bbb222"), col("grp").as("col-ccc333")), "all")
    writeLog(delta3, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"]}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
      """{"add":{"path":"all.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (df3, _) = DeltaImport.readDelta(spark, delta3)
    assert(df3.columns.toSeq == Seq("id", "tag", "grp") && df3.count() == 20)
    // id mode matches by parquet field id — loud refusal, never a misread
    val deltaId = freshDelta()
    Files.createDirectories(Paths.get(deltaId, "_delta_log"))
    stage(deltaId, full.limit(1), "f")
    writeLog(deltaId, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"}}}""",
      """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, deltaId))
    assert(e.getMessage.contains("column mapping mode 'id'"))
  }

  test("checkpointDelta refuses DV-bearing logs; carries column-mapping config") {
    import spark.implicits._
    import graft.sources.DeltaExport
    // DV refusal: a checkpoint that dropped the descriptors would
    // resurrect the masked rows once the prefix is vacuumed
    val deltaDv = freshDelta()
    Files.createDirectories(Paths.get(deltaDv, "_delta_log"))
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    stage(deltaDv, df, "f0")
    val data = DeltaImport.serializeRoaringArray(Seq(0L))
    val inl = DeltaImport.z85Encode(
      data ++ Array.fill[Byte]((4 - data.length % 4) % 4)(0))
    writeLog(deltaDv, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"${jesc(df.schema.json)}","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inl","sizeInBytes":${data.length},"cardinality":1}}}"""))
    val e = intercept[IllegalArgumentException](
      DeltaExport.checkpointDelta(spark, deltaDv))
    assert(e.getMessage.contains("resurrect"))
    // column-mapping config rides the checkpoint: fold -> checkpoint
    // -> vacuum prefix -> re-read still restores LOGICAL names
    import org.apache.spark.sql.types._
    val deltaCm = freshDelta()
    Files.createDirectories(Paths.get(deltaCm, "_delta_log"))
    def mapped(name: String, phys: String, id: Int, dt: DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id.toLong).build())
    val logical = StructType(Seq(
      mapped("id", "col-x1", 1, LongType), mapped("tag", "col-x2", 2, StringType)))
    stage(deltaCm,
      df.select(col("id").as("col-x1"), col("tag").as("col-x2")), "p0")
    writeLog(deltaCm, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},"schemaString":"${jesc(logical.json)}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
      """{"add":{"path":"p0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    DeltaExport.checkpointDelta(spark, deltaCm)
    Files.delete(Paths.get(deltaCm, "_delta_log", "0" * 20 + ".json"))
    val (out, st) = DeltaImport.readDelta(spark, deltaCm)
    assert(st.config("delta.columnMapping.mode") == "name")
    assert(out.columns.toSeq == Seq("id", "tag") && out.count() == 10)
  }

  test("checkpointDelta writes protocol-required fields; recheckpoint without new commits refuses") {
    import graft.sources.DeltaExport
    val delta = freshDelta()
    seedFlat(delta)
    val v = DeltaExport.checkpointDelta(spark, delta)
    assert(v == 1L)
    val cp = spark.read.parquet(
      Paths.get(delta, "_delta_log", "0" * 19 + "1.checkpoint.parquet")
        .toString)
    // checkpoint add rows RESTATE state: dataChange must be false
    val adds = cp.filter(col("add").isNotNull)
      .select(col("add.dataChange")).collect()
    assert(adds.length == 2 && adds.forall(!_.getBoolean(0)))
    // metaData carries the protocol-REQUIRED format (and createdTime)
    val md = cp.filter(col("metaData").isNotNull)
      .select(col("metaData.format.provider"),
        col("metaData.createdTime")).head
    assert(md.getString(0) == "parquet" && !md.isNullAt(1))
    // no new commits after the checkpoint: the refusal is the clean
    // documented one, not a FileAlreadyExistsException mid-move, and
    // no temp dir is left behind
    val e = intercept[IllegalArgumentException](
      DeltaExport.checkpointDelta(spark, delta))
    assert(e.getMessage.contains("nothing to checkpoint"))
    assert(!Files.exists(Paths.get(delta, "_tmp_checkpoint")))
    // a fresh commit past the checkpoint re-enables checkpointing
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"f0.parquet","dataChange":true}}"""))
    assert(DeltaExport.checkpointDelta(spark, delta) == 2L)
    val (out, _) = DeltaImport.readDelta(spark, delta)
    assert(out.count() == 10)
  }

  test("v2 UUID-named checkpoints: sidecar + inline adds fold; mismatch/missing/json refuse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log", "_sidecars"))
    val df = (1 to 30).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    stage(delta, df.filter(col("id") <= 10), "f0")
    stage(delta, df.filter(col("id") > 10 && col("id") <= 20), "f1")
    stage(delta, df.filter(col("id") > 20), "f2")

    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    def addRow(p: String) =
      Row(p, Map.empty[String, String], 1L, 0L, false)
    def onePart(rows: Seq[Row], schema: StructType, dst: java.nio.file.Path): Unit = {
      val tmp = s"$delta/_tmp_cp"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, dst)
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
    }
    // sidecar shard: f0 + f1 as add rows
    val scName = "11111111-2222-3333-4444-555555555555.parquet"
    onePart(Seq(Row(addRow("f0.parquet")), Row(addRow("f1.parquet"))),
      StructType(Seq(StructField("add", addT))),
      Paths.get(delta, "_delta_log", "_sidecars", scName))
    // manifest: protocol(v2Checkpoint) + metaData + checkpointMetadata
    // + one sidecar ref + ONE INLINE add (f2) — both forms fold
    val manifestT = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType)))),
      StructField("add", addT)))
    def manifestRows(cmVersion: Long) = Seq(
      Row(Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")),
        null, null, null, null),
      Row(null, Row("m", df.schema.json, Seq.empty[String],
        Map.empty[String, String]), null, null, null),
      Row(null, null, Row(cmVersion), null, null),
      Row(null, null, null, Row(scName, 1L), null),
      Row(null, null, null, null, addRow("f2.parquet")))
    val mName = "0" * 19 + "1.checkpoint.aaaabbbb-cccc-dddd-eeee-ffff00001111.parquet"
    onePart(manifestRows(1L), manifestT,
      Paths.get(delta, "_delta_log", mName))
    Files.writeString(Paths.get(delta, "_delta_log", "_last_checkpoint"),
      """{"version":1}""")
    // a JSON commit past the checkpoint still folds on top
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"f1.parquet","dataChange":true}}"""))
    val (out, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f2.parquet"))
    assert(out.count() == 20)
    assert(out.columns.toSeq == Seq("id", "tag"))

    // checkpointMetadata version mismatch refuses loudly
    Files.delete(Paths.get(delta, "_delta_log", mName))
    onePart(manifestRows(9L), manifestT,
      Paths.get(delta, "_delta_log", mName))
    val e1 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta))
    assert(e1.getMessage.contains("declares version 9"))

    // missing sidecar refuses loudly
    Files.delete(Paths.get(delta, "_delta_log", mName))
    onePart(manifestRows(1L), manifestT,
      Paths.get(delta, "_delta_log", mName))
    Files.delete(Paths.get(delta, "_delta_log", "_sidecars", scName))
    val e2 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta))
    assert(e2.getMessage.contains("sidecar"))

    // a v2 manifest in JSON form refuses loudly
    Files.delete(Paths.get(delta, "_delta_log", mName))
    Files.writeString(Paths.get(delta, "_delta_log",
      "0" * 19 + "1.checkpoint.aaaabbbb-cccc-dddd-eeee-ffff00001111.json"),
      "{}")
    val e3 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta))
    assert(e3.getMessage.contains("JSON form"))
  }

  test("readDelta AS OF version: replays to the cut, reaches behind a checkpoint, refuses vacuumed/missing") {
    val delta = freshDelta()
    seedFlat(delta) // v0: add f0,f1; v1: remove f1, add f2
    // head = {f0, f2}; AS OF 0 = {f0, f1}
    val (v0df, v0st) = DeltaImport.readDelta(spark, delta, Some(0L))
    assert(v0st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f1.parquet"))
    assert(v0df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 20L))
    val (v1df, v1st) = DeltaImport.readDelta(spark, delta, Some(1L))
    assert(v1st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f2.parquet"))
    assert(v1df.count() == 20)
    // a checkpoint at v1 does NOT block AS OF 0 while v0's JSON lives
    val schemaJson = {
      import spark.implicits._
      (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").schema.json
    }
    writeCheckpoint(delta, 1L, schemaJson, Seq.empty,
      Seq("f0.parquet" -> Map.empty, "f2.parquet" -> Map.empty))
    assert(DeltaImport.readDelta(spark, delta, Some(0L))._2
      .activeFiles.map(_._1).sorted == Seq("f0.parquet", "f1.parquet"))
    // importDelta AS OF lands the old snapshot in a graft table
    val gp = Files.createTempDirectory("graft-delta-asof").resolve("t").toString
    DeltaImport.importDelta(spark, delta, gp, asOfVersion = Some(0L))
    assert(GraftLake.read(spark, gp).count() == 20)
    // vacuum v0's JSON: AS OF 0 now refuses loudly (cannot reconstruct)
    Files.delete(Paths.get(delta, "_delta_log", "0" * 20 + ".json"))
    val e1 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta, Some(0L)))
    assert(e1.getMessage.contains("vacuumed") ||
      e1.getMessage.contains("non-contiguous"))
    // a version that never existed refuses with the latest
    val e2 = intercept[IllegalArgumentException](
      DeltaImport.readDelta(spark, delta, Some(7L)))
    assert(e2.getMessage.contains("does not exist"))
  }

  test("100k-add checkpoint folds with a bounded (narrow-projection) driver collect") {
    // A production Delta checkpoint carries millions of add rows with
    // fat per-file stats; the fold must move only (path,
    // partitionValues, deletionVector) to the driver — never whole
    // rows. This fixture pins that shape at 100k adds x 256-byte
    // stats: nested-schema pruning keeps `add.stats` (and the remove/
    // txn columns) out of the scan, and the fold stays seconds-fast
    // with O(live files) driver state.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val delta = freshDelta()
    Files.createDirectories(Paths.get(delta, "_delta_log"))
    val schema = StructType(Seq(
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType))))))
    val schemaJson = new StructType().add("k", LongType).json
    val n = 100000
    val fat = "x" * 256
    val addRows = spark.range(n).rdd.map { r =>
      val i: Long = r
      Row(null,
        Row(f"part-$i%06d.parquet", Map("p" -> (i % 7).toString), 1L,
          true, fat))
    }
    val metaRow = spark.sparkContext.parallelize(Seq(
      Row(Row("m", schemaJson, Seq("p"), Map.empty[String, String]), null)))
    val df = spark.createDataFrame(metaRow.union(addRows), schema)
    val tmp = s"$delta/_tmp_cp"
    df.repartition(4).write.parquet(tmp)
    val pieces = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    pieces.zipWithIndex.foreach { case (f, i) =>
      Files.move(f.toPath, Paths.get(delta, "_delta_log",
        f"${5L}%020d.checkpoint.${i + 1}%010d.${pieces.length}%010d.parquet"))
    }
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
    Files.writeString(Paths.get(delta, "_delta_log", "_last_checkpoint"),
      s"""{"version":5,"size":${n + 1},"parts":${pieces.length}}""")
    val t0 = System.nanoTime()
    val st = DeltaImport.foldDeltaLog(spark, delta)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(st.activeFiles.size == n)
    assert(st.partitionCols == Seq("p"))
    assert(st.activeFiles.head._1 == "part-000000.parquet")
    assert(st.activeFiles.map(_._1).toSet.contains("part-099999.parquet"))
    assert(st.activeFiles.forall { case (_, pv) => pv.keySet == Set("p") })
    // generous ceiling: a full-row collect of 100k fat rows through
    // the old path was also seconds, but a DATA-sized misfold (e.g.
    // accidentally reading stats per row into driver maps) trips this
    assert(sec < 60.0, s"checkpoint fold took $sec s")
  }

  test("re-added file counts once; remove of a never-added path is a no-op") {
    import spark.implicits._
    val delta = freshDelta()
    seedFlat(delta)
    writeLog(delta, 2, Seq(
      """{"remove":{"path":"ghost.parquet","dataChange":true}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val (df, st) = DeltaImport.readDelta(spark, delta)
    assert(st.activeFiles.map(_._1).sorted == Seq("f0.parquet", "f2.parquet"))
    assert(df.count() == 20)
  }
}
