package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** One-way IMPORT of a Delta Lake table into a graft lake table — the
  * cross-format on-ramp (Delta's own `CONVERT TO DELTA`, pointed the
  * other way). The PUBLIC Delta transaction-log protocol
  * (github.com/delta-io/delta PROTOCOL.md) is a directory of
  * newline-delimited JSON commits `_delta_log/<20-digit version>.json`
  * whose actions this reader folds:
  *
  *   - `metaData`: schemaString (Spark StructType JSON) + partition
  *     columns; the LAST one wins.
  *   - `add` / `remove`: the active-file reconciliation — a file is
  *     live iff its last action is an add.
  *   - `protocol`: refused above the basic reader version (reader
  *     features like deletion vectors / column mapping change file
  *     semantics this import does not speak).
  *
  * Partition columns are NOT stored in Delta's parquet files — only
  * in each add's `partitionValues` — so the import reads one relation
  * per distinct partition tuple (O(tuples) plan entries, the same
  * budget class as the hive read path) and re-injects the values as
  * typed literal columns before a single distributed write lands the
  * rows as a graft table (hive-laid-out when the source was
  * partitioned). The import is a REWRITE by design: cross-format
  * zero-copy would pin the graft table's correctness to a foreign
  * log's vacuum/retention policy.
  *
  * Scale shape: log parsing is O(commits + files) driver metadata
  * work; the data move is ONE distributed read→write pass (never a
  * driver-side byte copy); refusals are loud, never silent subsets.
  */
object DeltaImport {

  private[graft] final case class DeltaState(
      schema: StructType,
      partitionCols: Seq[String],
      activeFiles: Seq[(String, Map[String, String])],
      // the metaData `configuration` map — carries
      // delta.columnMapping.mode for column-mapped tables
      config: Map[String, String] = Map.empty,
      // outstanding DELETION VECTORS: file path -> deleted row
      // positions (resolved from the descriptor at fold time,
      // O(dv bytes) driver work). Only DV-bearing live files appear.
      deletes: Map[String, Array[Long]] = Map.empty)

  // ---------------------------------------------------- deletion vectors

  /** The public DeletionVectorDescriptor (PROTOCOL.md): storageType
    * `i` = inline (pathOrInlineDv is the Z85-encoded serialized
    * bitmap), `u` = relative UUID file (Z85 of [prefix +] 16-byte
    * UUID; stored as `[prefix/]deletion_vector_<uuid>.bin` under the
    * table root), `p` = absolute path. `offset` locates the blob in
    * the file; `sizeInBytes` is the blob's data length.
    */
  private[graft] final case class DvDesc(
      storageType: String, pathOrInlineDv: String,
      offset: Long, sizeInBytes: Long, cardinality: Long)

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private lazy val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** ZeroMQ Z85: 5 chars -> 4 bytes, big-endian base-85. */
  private[graft] def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  private[graft] def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"z85 input length ${b.length} not *4")
    val sb = new java.lang.StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = Z85Alphabet(((v % 85).toInt)); v /= 85; j -= 1 }
      sb.append(cs)
      i += 4
    }
    sb.toString
  }

  /** Serialize one 32-bit roaring bitmap (RoaringFormatSpec, no-run
    * cookie 12346): descriptive headers (key, cardinality-1),
    * per-container byte offsets, then array containers (card ≤ 4096,
    * sorted uint16 values) or 1024-word bitmap containers —
    * little-endian throughout, the exact inverse of what
    * [[roaringArrayPositions]] reads.
    */
  private[graft] def serializeRoaring32(values: Array[Int]): Array[Byte] = {
    val byKey = values.map(_ & 0xffffffffL).distinct.sorted
      .groupBy(v => ((v >>> 16) & 0xffffL).toInt).toSeq.sortBy(_._1)
    val payloads = byKey.map { case (_, vs) =>
      if (vs.length <= 4096) 2 * vs.length else 8192
    }
    val size = byKey.size
    val headerLen = 4 + 4 + 4 * size + 4 * size
    val bb = java.nio.ByteBuffer.allocate(headerLen + payloads.sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12346)
    bb.putInt(size)
    byKey.foreach { case (k, vs) =>
      bb.putShort(k.toShort); bb.putShort((vs.length - 1).toShort)
    }
    var off = headerLen
    payloads.foreach { pl => bb.putInt(off); off += pl }
    byKey.foreach { case (_, vs) =>
      if (vs.length <= 4096)
        vs.foreach(v => bb.putShort((v & 0xffffL).toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val low = (v & 0xffffL).toInt
          words(low >>> 6) |= (1L << (low & 63))
        }
        words.foreach(bb.putLong)
      }
    }
    bb.array()
  }

  /** Serialize Delta's RoaringBitmapArray "portable" format (magic,
    * bitmap count, one 32-bit roaring bitmap per 2^32 position range
    * — intermediate empties included, since readers assign the high
    * bits by INDEX).
    */
  private[graft] def serializeRoaringArray(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative deletion-vector position")
    val sorted = positions.distinct.sorted
    val maxHigh = if (sorted.isEmpty) -1L else sorted.last >>> 32
    val groups = sorted.groupBy(_ >>> 32)
    val parts = (0L to maxHigh).map { hi =>
      serializeRoaring32(
        groups.getOrElse(hi, Array.empty[Long]).map(p => (p & 0xffffffffL).toInt))
    }
    val bb = java.nio.ByteBuffer.allocate(12 + parts.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(maxHigh + 1)
    parts.foreach(bb.put)
    bb.array()
  }

  /** Deserialize Delta's RoaringBitmapArray "portable" format: magic
    * 1681511377 (int32 LE), bitmap count (int64 LE), then one
    * standard 32-bit roaring portable bitmap per entry (index i
    * contributes the high 32 bits). Returns sorted positions.
    */
  private[graft] def roaringArrayPositions(data: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == 1681511377,
      s"deletion vector bitmap magic $magic != 1681511377 — not the " +
        "portable RoaringBitmapArray format")
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps < (1L << 20),
      s"implausible bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var bi = 0L
    while (bi < nBitmaps) {
      val high = bi << 32
      // ---- one 32-bit roaring portable bitmap (RoaringFormatSpec)
      val cookie = bb.getInt
      val (size, runFlags) =
        if ((cookie & 0xffff) == 12347) { // SERIAL_COOKIE: runs present
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          bb.get(flags)
          (n, flags)
        } else {
          require(cookie == 12346,
            s"unknown roaring cookie $cookie")
          (bb.getInt, Array.empty[Byte])
        }
      val keys = new Array[Int](size)
      val cards = new Array[Int](size)
      var i = 0
      while (i < size) {
        keys(i) = bb.getShort & 0xffff
        cards(i) = (bb.getShort & 0xffff) + 1
        i += 1
      }
      // offsets are present for the no-run cookie or size >= 4 —
      // containers are sequential, so skip them
      if (runFlags.isEmpty || size >= 4) bb.position(bb.position() + 4 * size)
      i = 0
      while (i < size) {
        val base = high | (keys(i).toLong << 16)
        val isRun = runFlags.nonEmpty &&
          (runFlags(i / 8) & (1 << (i % 8))) != 0
        if (isRun) {
          val nRuns = bb.getShort & 0xffff
          var r = 0
          while (r < nRuns) {
            val start = bb.getShort & 0xffff
            val len = bb.getShort & 0xffff
            var v = start
            while (v <= start + len) { out += (base | v.toLong); v += 1 }
            r += 1
          }
        } else if (cards(i) <= 4096) {
          var c = 0
          while (c < cards(i)) {
            out += (base | (bb.getShort & 0xffff).toLong)
            c += 1
          }
        } else {
          var w = 0
          while (w < 1024) {
            val word = bb.getLong
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0)
                out += (base | ((w * 64 + bit).toLong))
              bit += 1
            }
            w += 1
          }
        }
        i += 1
      }
      bi += 1
    }
    out.toArray.sorted
  }

  /** Serialize positions as a portable RoaringBitmapArray (array and
    * bitmap containers, no runs) — the writer half used to fabricate
    * protocol-conformant DVs for gates/specs and the DV export.
    * Inverse of [[roaringArrayPositions]]; delegates to the
    * Array[Long] overload (one wire-format implementation).
    */
  private[graft] def serializeRoaringArray(positions: Seq[Long]): Array[Byte] =
    serializeRoaringArray(positions.toArray)

  /** Resolve a descriptor to its deleted row positions. File-backed
    * blobs follow the public DV file layout: a 1-byte format version
    * (1), and at `offset` a big-endian int32 data size, the bitmap
    * data, and a big-endian CRC32 of the data (verified — a torn DV
    * must fail loudly, silently missing deletes resurrects rows).
    */
  private[graft] def dvPositions(
      deltaPath: String, dv: DvDesc): Array[Long] = dv.storageType match {
    case "i" =>
      // z85 pads to 4-byte groups; sizeInBytes trims the padding
      val data = z85Decode(dv.pathOrInlineDv)
      val n = if (dv.sizeInBytes >= 0) dv.sizeInBytes.toInt else data.length
      roaringArrayPositions(data.take(n))
    case t @ ("u" | "p") =>
      val file =
        if (t == "p") Paths.get(dv.pathOrInlineDv)
        else {
          // only the LAST 20 chars are the z85-encoded 16-byte uuid;
          // anything before them is a literal random-prefix directory
          // (decoding the whole string would break on prefixes whose
          // length is not a multiple of 5)
          require(dv.pathOrInlineDv.length >= 20,
            s"DV uuid payload too short: '${dv.pathOrInlineDv}'")
          val raw = z85Decode(dv.pathOrInlineDv.takeRight(20))
          val prefix = dv.pathOrInlineDv.dropRight(20) match {
            case "" => ""
            case p => p + "/"
          }
          val bb = java.nio.ByteBuffer.wrap(raw)
          val uuid = new java.util.UUID(bb.getLong, bb.getLong)
          Paths.get(deltaPath, prefix + s"deletion_vector_$uuid.bin")
        }
      require(Files.exists(file), s"deletion vector file missing: $file")
      val all = Files.readAllBytes(file)
      require(all.nonEmpty && all(0) == 1,
        s"unsupported DV file format version ${all.headOption.orNull} at $file")
      val bb = java.nio.ByteBuffer.wrap(all) // big-endian (default)
      bb.position(dv.offset.toInt)
      val size = bb.getInt
      require(size == dv.sizeInBytes,
        s"DV blob size $size != descriptor sizeInBytes ${dv.sizeInBytes} at $file")
      val data = new Array[Byte](size)
      bb.get(data)
      val storedCrc = bb.getInt
      val crc = new java.util.zip.CRC32
      crc.update(data)
      require(crc.getValue.toInt == storedCrc,
        s"DV blob checksum mismatch at $file offset ${dv.offset}")
      roaringArrayPositions(data)
    case other => throw new IllegalArgumentException(
      s"unknown DV storageType '$other'")
  }

  /** The PHYSICAL column name of a field under Delta column mapping
    * (name mode): the `delta.columnMapping.physicalName` entry of the
    * field's schemaString metadata; the logical name when unmapped.
    */
  private[graft] def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The schema as the parquet FILES spell it: every field (at every
    * nesting level) renamed to its physical name. Types unchanged.
    */
  private[graft] def physicalSchema(st: StructType): StructType = {
    import org.apache.spark.sql.types._
    StructType(st.fields.map { f =>
      val dt = f.dataType match {
        case s: StructType => physicalSchema(s)
        case ArrayType(s: StructType, n) => ArrayType(physicalSchema(s), n)
        case MapType(k, s: StructType, n) => MapType(k, physicalSchema(s), n)
        case other => other
      }
      StructField(physicalName(f), dt, f.nullable, f.metadata)
    })
  }

  /** The protocol gate, shared by the JSON and checkpoint folds:
    * reader version 1 is the base protocol, 2 adds column mapping
    * (name mode imports; id mode refuses when metaData declares it),
    * 3 lists explicit readerFeatures of which columnMapping,
    * deletionVectors, and v2Checkpoint are spoken — anything else
    * changes file semantics this import does not speak.
    */
  private def checkProtocol(
      minReader: Int, readerFeatures: Option[Set[String]],
      where: String): Unit =
    minReader match {
      case v if v <= 2 => ()
      case 3 =>
        val fs = readerFeatures.getOrElse(Set("<unlisted>"))
        val unsupported =
          fs -- Set("columnMapping", "deletionVectors", "v2Checkpoint")
        require(unsupported.isEmpty,
          s"delta readerFeatures ${unsupported.mkString(", ")} at $where — " +
            "this import speaks only columnMapping, deletionVectors, and " +
            "v2Checkpoint; compact the source table first")
      case v => throw new IllegalArgumentException(
        s"delta minReaderVersion $v at $where is unsupported")
    }

  /** The checkpoint `_last_checkpoint` names: (version, checkpoint
    * parquet files). Classic single-file `<v>.checkpoint.parquet`,
    * classic multi-part `<v>.checkpoint.<i>.<n>.parquet`, or the V2
    * UUID-named manifest `<v>.checkpoint.<uuid>.parquet` (whose
    * `sidecar` rows the fold resolves under `_sidecars/`). A v2
    * manifest in JSON form, or a `_last_checkpoint` whose files are
    * absent under every spoken name (a torn write), refuses loudly.
    */
  private def readLastCheckpoint(
      logDir: java.nio.file.Path, deltaPath: String)
      : Option[(Long, Seq[String])] = {
    val f = logDir.resolve("_last_checkpoint")
    if (!Files.exists(f)) return None
    val txt = Files.readString(f)
    val v = """"version"\s*:\s*(\d+)""".r.unanchored.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(
        throw new IllegalArgumentException(
          s"malformed _last_checkpoint at $deltaPath: $txt"))
    val parts = """"parts"\s*:\s*(\d+)""".r.unanchored
      .findFirstMatchIn(txt).map(_.group(1).toInt)
    val names = parts match {
      case None => Seq(f"$v%020d.checkpoint.parquet")
      case Some(p) => (1 to p).map(i =>
        f"$v%020d.checkpoint.$i%010d.$p%010d.parquet")
    }
    val missing = names.filterNot(n => Files.exists(logDir.resolve(n)))
    if (missing.isEmpty)
      return Some(v -> names.map(n => logDir.resolve(n).toString))
    // V2 (UUID-named) checkpoint manifest: <v>.checkpoint.<uuid>.parquet
    // — 4 dot-segments with a non-numeric third (multi-part classic
    // has 5; classic single has 3).
    val prefix = f"$v%020d.checkpoint."
    val listing = Files.list(logDir)
    val cands =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(prefix)).toSeq
      finally listing.close()
    val v2 = cands.filter { n =>
      val segs = n.split("\\.")
      n.endsWith(".parquet") && segs.length == 4 && !segs(2).forall(_.isDigit)
    }
    if (v2.nonEmpty)
      return Some(v -> v2.sorted.map(n => logDir.resolve(n).toString))
    require(!cands.exists(_.endsWith(".json")),
      s"checkpoint at $deltaPath v$v is a V2 manifest in JSON form " +
        s"(${cands.filter(_.endsWith(".json")).mkString(", ")}) — this " +
        "import speaks parquet manifests only")
    throw new IllegalArgumentException(
      s"_last_checkpoint at $deltaPath names version $v but " +
        s"${missing.mkString(", ")} is missing and no UUID-named " +
        "manifest exists — an incomplete checkpoint")
  }

  /** Fold `_delta_log` at `deltaPath` into (schema, partition columns,
    * active files with their partition values). A checkpointed log
    * (the shape every real Delta table reaches after ~10 commits)
    * folds the checkpoint parquet FIRST — its add rows are the live
    * set at the checkpoint version, its remove rows are expired
    * tombstone bookkeeping with no file effect — then replays the
    * JSON commits after it, which must be contiguous from
    * checkpoint+1 (from 0 when there is no checkpoint).
    */
  private[graft] def foldDeltaLog(
      spark: SparkSession, deltaPath: String,
      asOfVersion: Option[Long] = None): DeltaState = {
    val logDir = Paths.get(deltaPath, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log at $deltaPath")
    val checkpointHead = readLastCheckpoint(logDir, deltaPath)
    // TIME TRAVEL behind the checkpoint replays the JSON commits from
    // version 0 instead (the checkpoint bakes later state in) — the
    // contiguity check below refuses loudly if that prefix was
    // vacuumed away, exactly like Delta's own AS OF.
    val checkpoint = asOfVersion match {
      case Some(v) if checkpointHead.exists(_._1 > v) => None
      case _ => checkpointHead
    }
    val listing = Files.list(logDir)
    val allVersions =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && n.dropRight(5).forall(_.isDigit))
        .map(n => n.dropRight(5).toLong -> n).toSeq.sortBy(_._1)
      finally listing.close()
    asOfVersion.foreach { v =>
      val maxKnown = math.max(checkpointHead.map(_._1).getOrElse(-1L),
        allVersions.lastOption.map(_._1).getOrElse(-1L))
      require(v >= 0 && v <= maxKnown,
        s"version AS OF $v at $deltaPath does not exist " +
          s"(latest version is $maxKnown)")
    }
    // Versions at or below the checkpoint are baked into it — a
    // vacuumed/truncated prefix there is normal, not an error.
    val minV = checkpoint.map(_._1 + 1).getOrElse(0L)
    val versions = allVersions.filter(_._1 >= minV)
      .filter(nv => asOfVersion.forall(nv._1 <= _))
    require(checkpoint.nonEmpty || versions.nonEmpty,
      s"empty _delta_log at $deltaPath" + asOfVersion.map(v =>
        s" at version $v (its JSON commits were vacuumed past the " +
          "checkpoint — AS OF cannot reconstruct it)").getOrElse(""))
    require(versions.map(_._1) ==
      (minV until minV + versions.size.toLong),
      s"non-contiguous delta log versions after ${minV - 1} at $deltaPath " +
        s"(partially vacuumed past its checkpoint?): " +
        s"${versions.map(_._1).mkString(",")}")

    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Seq.empty
    var config: Map[String, String] = Map.empty
    // insertion-ordered so import output is deterministic
    val live = scala.collection.mutable.LinkedHashMap[String, Map[String, String]]()
    // path -> outstanding deletion-vector descriptor (an add WITHOUT
    // a DV clears any prior one — Delta re-adds replace the whole
    // file state)
    val dvs = scala.collection.mutable.HashMap[String, DvDesc]()
    val SchemaRe = """"schemaString":"((?:[^"\\]|\\.)*)"""".r.unanchored
    val PartRe = """"partitionColumns":\[([^\]]*)\]""".r.unanchored
    val PathRe = """"path":"((?:[^"\\]|\\.)*)"""".r.unanchored
    val KvRe = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
    val ReaderVRe = """"minReaderVersion":(\d+)""".r.unanchored
    // Single-pass JSON string unescape (sequential replace() pairs are
    // order-sensitive: "\\n" — escaped backslash + n — must decode to
    // backslash-n, never to a newline).
    def unesc(s: String): String = {
      val b = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b.append('\n'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case 'u' if i + 5 < s.length =>
              b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c => b.append(c); i += 2 // \" \\ \/ and friends
          }
        } else { b.append(ch); i += 1 }
      }
      b.toString
    }
    // Each delta log line is ONE action object whose single top-level
    // key names the action — classify by that PREFIX, never by a
    // substring (a remove whose partitionValues/tags contain the text
    // "add" must not resurrect the removed file).
    def actionOf(line: String): String = {
      val t = line.trim
      val m = """^\{\s*"([A-Za-z]+)"""".r.unanchored.findPrefixMatchOf(t)
      m.map(_.group(1)).getOrElse("")
    }

    // Checkpoint fold — DISTRIBUTED projection, bounded collects. A
    // production checkpoint carries millions of add rows with fat
    // stats/remove/txn payloads; collecting full rows would move GBs
    // to the driver. Instead: (a) the O(1)/O(sidecars) control rows
    // (protocol, metaData, checkpointMetadata, sidecar) come back
    // through per-column filtered selects, and (b) add rows come
    // back through ONE narrow (path, partitionValues, deletionVector)
    // projection — nested-schema pruning keeps `add.stats` and every
    // other column out of the scan, so driver memory is exactly the
    // O(live files) state this fold must hold anyway. `remove` rows
    // in a checkpoint are expired-tombstone bookkeeping with no file
    // effect and are never read at all.
    checkpoint.foreach { case (cpv, files) =>
      val cdf = spark.read.parquet(files: _*)
      val cpAdds = scala.collection.mutable.ArrayBuffer[(String, Map[String, String])]()
      // V2 manifests carry `sidecar` rows naming add/remove shards
      // under _sidecars/, and a `checkpointMetadata` row pinning the
      // version — inline add rows stay legal in both forms.
      val sidecars = scala.collection.mutable.ArrayBuffer[String]()
      def controlRows(df: org.apache.spark.sql.DataFrame): Unit = {
        val fields = df.schema.fieldNames
        if (fields.contains("protocol"))
          df.filter(col("protocol").isNotNull).select(col("protocol"))
            .collect().foreach { r =>
              val p = r.getStruct(0)
              val fi = p.schema.fieldNames.indexOf("minReaderVersion")
              val mrv = if (fi >= 0 && !p.isNullAt(fi)) p.getInt(fi) else 1
              val ffi = p.schema.fieldNames.indexOf("readerFeatures")
              val feats =
                if (ffi >= 0 && !p.isNullAt(ffi))
                  Some(p.getSeq[String](ffi).toSet)
                else None
              checkProtocol(mrv, feats, s"checkpoint at $deltaPath")
            }
        if (fields.contains("metaData"))
          df.filter(col("metaData").isNotNull).select(col("metaData"))
            .collect().foreach { r =>
              val m = r.getStruct(0)
              Option(m.getAs[String]("schemaString")).foreach(sj =>
                schemaJson = Some(sj))
              partCols = Option(m.getAs[scala.collection.Seq[String]](
                "partitionColumns")).map(_.toSeq).getOrElse(Seq.empty)
              val ci = m.schema.fieldNames.indexOf("configuration")
              if (ci >= 0 && !m.isNullAt(ci))
                config = m.getAs[scala.collection.Map[String, String]](ci).toMap
            }
        if (fields.contains("checkpointMetadata"))
          df.filter(col("checkpointMetadata").isNotNull)
            .select(col("checkpointMetadata")).collect().foreach { r =>
              val cm = r.getStruct(0)
              val vi = cm.schema.fieldNames.indexOf("version")
              if (vi >= 0 && !cm.isNullAt(vi)) {
                val mv = cm.get(vi).asInstanceOf[Number].longValue
                require(mv == cpv,
                  s"v2 checkpoint manifest at $deltaPath declares version " +
                    s"$mv but _last_checkpoint names $cpv — torn or " +
                    "mismatched checkpoint")
              }
            }
        if (fields.contains("sidecar"))
          df.filter(col("sidecar").isNotNull).select(col("sidecar.path"))
            .collect().foreach { r =>
              Option(r.getString(0)).foreach { p =>
                // sidecar paths are file names under _sidecars/ or
                // absolute URIs (the spec allows both)
                val resolved =
                  if (p.startsWith("/")) p
                  else if (p.startsWith("file:"))
                    p.stripPrefix("file:").replaceAll("^//", "")
                  else logDir.resolve("_sidecars").resolve(p).toString
                require(Files.exists(Paths.get(resolved)),
                  s"v2 checkpoint sidecar $p at $deltaPath is missing " +
                    s"(expected $resolved)")
                sidecars += resolved
              }
            }
      }
      def addRows(df: org.apache.spark.sql.DataFrame): Unit = {
        if (!df.schema.fieldNames.contains("add")) return
        val addT = df.schema("add").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val pvCol =
          if (addT.fieldNames.contains("partitionValues"))
            col("add.partitionValues")
          else typedLit(Map.empty[String, String])
        val dvCol =
          if (addT.fieldNames.contains("deletionVector"))
            col("add.deletionVector")
          else lit(null)
        df.filter(col("add").isNotNull)
          .select(col("add.path").as("p"), pvCol.as("pv"), dvCol.as("dv"))
          .collect().foreach { r =>
            val p = r.getString(0)
            val pv = Option(r.getAs[scala.collection.Map[String, String]](1))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            cpAdds += p -> pv
            dvs.remove(p)
            if (!r.isNullAt(2)) {
              val d = r.getStruct(2)
              def nfld(k: String): Long = {
                val i = d.schema.fieldNames.indexOf(k)
                if (i < 0 || d.isNullAt(i)) -1L
                else d.get(i).asInstanceOf[Number].longValue
              }
              dvs.put(p, DvDesc(
                d.getAs[String]("storageType"),
                d.getAs[String]("pathOrInlineDv"),
                math.max(nfld("offset"), 1L), nfld("sizeInBytes"),
                nfld("cardinality")))
            }
          }
      }
      controlRows(cdf)
      addRows(cdf)
      // sidecar shards carry FILE actions only (the v2 spec) — one
      // multi-path narrow add-projection over all of them
      if (sidecars.nonEmpty)
        addRows(spark.read.parquet(sidecars.toSeq: _*))
      // the checkpoint is a SNAPSHOT — row order is meaningless; sort
      // by path so import output is deterministic
      cpAdds.sortBy(_._1).foreach { case (p, pv) =>
        live.remove(p); live.put(p, pv)
      }
    }

    versions.foreach { case (_, name) =>
      Files.readString(logDir.resolve(name)).split("\n")
        .filter(_.trim.nonEmpty).foreach { line =>
          actionOf(line) match {
            case "protocol" =>
              val mrv = ReaderVRe.findFirstMatchIn(line)
                .map(_.group(1).toInt).getOrElse(1)
              val feats = """"readerFeatures":\[([^\]]*)\]""".r.unanchored
                .findFirstMatchIn(line)
                .map(m => KvParse.strings(m.group(1)).toSet)
              checkProtocol(mrv, feats, deltaPath)
            case "metaData" =>
              SchemaRe.findFirstMatchIn(line).foreach(m =>
                schemaJson = Some(unesc(m.group(1))))
              partCols = PartRe.findFirstMatchIn(line).map(m =>
                KvParse.strings(m.group(1))).getOrElse(Seq.empty)
              config = jsonObjectBody(line, "\"configuration\":").map { body =>
                KvRe.findAllMatchIn(body)
                  .map(k => unesc(k.group(1)) -> unesc(k.group(2))).toMap
              }.getOrElse(Map.empty)
            case "add" =>
              for (p <- PathRe.findFirstMatchIn(line).map(m => unesc(m.group(1)))) {
                val pv = partValsBody(line).map { body =>
                  KvRe.findAllMatchIn(body)
                    .map(k => unesc(k.group(1)) -> unesc(k.group(2))).toMap
                }.getOrElse(Map.empty[String, String])
                live.remove(p) // re-add moves to the tail (Delta semantics: latest wins)
                live.put(p, pv)
                dvs.remove(p) // a DV-less re-add clears the file's DV
                jsonObjectBody(line, "\"deletionVector\":").foreach { body =>
                  // manual scan, not regex: the per-character regex
                  // alternation overflows the stack on multi-KB
                  // inline z85 payloads
                  def sf(k: String) = jsonStringField(body, k).map(unesc)
                  def nf(k: String) =
                    (s""""$k":(-?\\d+)""").r.unanchored
                      .findFirstMatchIn(body).map(_.group(1).toLong)
                  dvs.put(p, DvDesc(
                    sf("storageType").getOrElse(""),
                    sf("pathOrInlineDv").getOrElse(""),
                    nf("offset").getOrElse(1L),
                    nf("sizeInBytes").getOrElse(-1L),
                    nf("cardinality").getOrElse(-1L)))
                }
              }
            case "remove" =>
              PathRe.findFirstMatchIn(line).foreach { m =>
                live.remove(unesc(m.group(1)))
                dvs.remove(unesc(m.group(1)))
              }
            case _ => () // commitInfo, cdc, domainMetadata, txn — no file effect
          }
        }
    }
    require(schemaJson.nonEmpty, s"no metaData action in delta log at $deltaPath")
    val schema = DataType.fromJson(schemaJson.get).asInstanceOf[StructType]
    // Resolve outstanding DVs on LIVE files to row positions now —
    // O(dv bytes) driver work, verified against the descriptor's
    // cardinality (an under-read DV would silently resurrect rows).
    val deletes = dvs.toMap.filter { case (p, _) => live.contains(p) }
      .map { case (p, d) =>
        val pos = dvPositions(deltaPath, d)
        require(d.cardinality < 0 || pos.length == d.cardinality,
          s"DV for $p decoded ${pos.length} positions but the descriptor " +
            s"claims ${d.cardinality}")
        p -> pos
      }
    DeltaState(schema, partCols, live.toSeq, config, deletes)
  }

  /** The active rows of the delta table as ONE DataFrame: data columns
    * read from the live files, partition columns re-injected per
    * distinct partition tuple as typed literals.
    */
  private[graft] def readDelta(spark: SparkSession, deltaPath: String,
      asOfVersion: Option[Long] = None): (DataFrame, DeltaState) = {
    val st = foldDeltaLog(spark, deltaPath, asOfVersion)
    require(st.activeFiles.nonEmpty, s"delta table at $deltaPath has no live files")
    // COLUMN MAPPING: name mode reads the files under their PHYSICAL
    // names (every level) and restores the logical names; id mode
    // matches columns by parquet field id, which this reader does not
    // speak — loud refusal, never a misread.
    val mode = st.config.getOrElse("delta.columnMapping.mode", "none")
    require(mode == "none" || mode == "name",
      s"delta column mapping mode '$mode' at $deltaPath — only name " +
        "mode (and unmapped tables) import; rewrite the source to name " +
        "mode first")
    val dataFields =
      st.schema.fields.filterNot(f => st.partitionCols.contains(f.name)).toSeq
    val readSchema = physicalSchema(StructType(dataFields))
    // physical -> logical restore: top-level rename + a struct cast
    // that renames every nested level back (types are unchanged, so
    // the cast is a pure rename; identity when unmapped)
    def restore(raw: DataFrame): DataFrame =
      raw.select(dataFields.map(f =>
        col(s"`${physicalName(f)}`").cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    // partitionValues are keyed by PHYSICAL name under column mapping
    val physOfPart = st.partitionCols.map(pc =>
      pc -> physicalName(st.schema(pc))).toMap
    def abs(p: String) = Paths.get(deltaPath, p).toString
    // DV-bearing files read INDIVIDUALLY with the parquet
    // `_metadata.row_index` column — the file-order row position the
    // DV indexes — and drop masked positions via a BROADCAST
    // anti-join against the position list (scales to million-row
    // DVs where an In-literal list would blow the plan; the
    // positions are per-file bounded). DV-free files keep the one
    // grouped scan.
    def readFiles(files: Seq[String]): DataFrame = {
      val (dvd, plain) = files.partition(st.deletes.contains)
      val parts =
        (if (plain.nonEmpty)
           Seq(spark.read.schema(readSchema).parquet(plain.map(abs): _*))
         else Seq.empty) ++
        dvd.map { f =>
          import spark.implicits._
          val posDf = st.deletes(f).toSeq.toDF("__graft_del_pos")
          spark.read.schema(readSchema).parquet(abs(f))
            .select(col("*"), col("_metadata.row_index").as("__graft_pos"))
            .join(broadcast(posDf),
              col("__graft_pos") === col("__graft_del_pos"), "left_anti")
            .drop("__graft_pos")
        }
      restore(parts.reduce(_ unionByName _))
    }
    val df =
      if (st.partitionCols.isEmpty)
        readFiles(st.activeFiles.map(_._1))
      else {
        // Delta stores partition values ONLY in the log — group the
        // live files by tuple (O(tuples) relations) and re-inject.
        val groups = st.activeFiles
          .groupBy(_._2).toSeq
          .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
        groups.map { case (pv, files) =>
          var g = readFiles(files.map(_._1))
          st.partitionCols.foreach { pc =>
            val dt = st.schema(pc).dataType
            val raw = pv.get(physOfPart(pc)).filter(_ != null)
            g = g.withColumn(pc,
              raw.map(v => lit(v).cast(dt)).getOrElse(lit(null).cast(dt)))
          }
          g.select(st.schema.fieldNames.map(col).toIndexedSeq: _*)
        }.reduce(_ unionByName _)
      }
    (df.select(st.schema.fieldNames.map(col).toIndexedSeq: _*), st)
  }

  /** IMPORT: materialize the delta table's current snapshot as a NEW
    * graft table at `graftPath` — hive-partitioned by the source's
    * partition columns when their values live in the integral layout
    * domain (the graft hive layout keys on long-image directory
    * constants); otherwise flat, with the partition columns folded
    * into the zone-map stats so string/temporal partition predicates
    * still prune. One distributed pass; returns the committed version.
    */
  def importDelta(
      spark: SparkSession, deltaPath: String, graftPath: String,
      statsCols: Seq[String] = Seq.empty,
      asOfVersion: Option[Long] = None): Int = {
    val (df, st) = readDelta(spark, deltaPath, asOfVersion)
    val hiveable = st.partitionCols.nonEmpty && st.partitionCols.forall(pc =>
      GraftLake.sumStatEligible(st.schema(pc).dataType))
    if (hiveable) {
      val v = GraftLake.appendPartitionedBy(df, graftPath,
        st.partitionCols, statsCols = statsCols)
      GraftLake.setPartitionColumns(graftPath, st.partitionCols)
      v
    } else
      GraftLake.create(df, graftPath,
        statsCols = (statsCols ++ st.partitionCols).distinct)
  }

  /** The (still-escaped) string VALUE of `"key":"..."` in `line`,
    * scanned manually: the `(?:[^"\\]|\\.)*` regex alternation
    * recurses once per character and overflows the JVM stack on
    * multi-KB values (inline deletion vectors).
    */
  private[graft] def jsonStringField(
      line: String, key: String): Option[String] = {
    val pat = "\"" + key + "\":\""
    val at = line.indexOf(pat)
    if (at < 0) return None
    var i = at + pat.length
    val b = new java.lang.StringBuilder()
    while (i < line.length && line.charAt(i) != '"') {
      if (line.charAt(i) == '\\' && i + 1 < line.length) {
        b.append(line.charAt(i)); b.append(line.charAt(i + 1)); i += 2
      } else { b.append(line.charAt(i)); i += 1 }
    }
    Some(b.toString)
  }

  /** Extract the `partitionValues` object body ([[jsonObjectBody]]).
    * None when the action carries no partitionValues.
    */
  private[graft] def partValsBody(line: String): Option[String] =
    jsonObjectBody(line, "\"partitionValues\":")

  /** Extract the object BODY following `key` with a string-aware
    * scan: a legal JSON string value may contain '{' or '}', so a
    * brace-bounded regex would truncate the object mid-value and
    * silently drop/corrupt entries. The scan respects JSON string
    * boundaries (escapes included) and refuses loudly on an
    * unterminated object. None when `key` is absent.
    */
  private[graft] def jsonObjectBody(
      line: String, key: String): Option[String] = {
    val at = line.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < line.length && line.charAt(i).isWhitespace) i += 1
    if (i >= line.length || line.charAt(i) != '{') return None
    val start = i + 1
    i = start
    var depth = 1
    var inStr = false
    while (i < line.length && depth > 0) {
      val ch = line.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    require(depth == 0,
      s"unterminated partitionValues object in delta action: $line")
    Some(line.substring(start, i - 1))
  }

  private object KvParse {
    /** `"a","b"` → Seq(a, b) (the partitionColumns array body). */
    def strings(body: String): Seq[String] =
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
  }
}

/** One-way EXPORT of a graft lake table AS a Delta Lake table — the
  * interop off-ramp (Delta UniForm's direction, pointed at Delta):
  * one distributed write of the current snapshot (hive `partitionBy`
  * layout when the table has partition columns, matching Delta's
  * directory convention), then a version-0 `_delta_log` of
  * protocol / metaData / add actions per the public protocol. The
  * export is a self-contained COPY — referencing the graft sets by
  * absolute path would couple the Delta table's correctness to the
  * graft table's vacuum policy (the exact hazard the import direction
  * refuses).
  *
  * Because the copy goes through [[GraftLake.read]], the export
  * serves EVERY table state: outstanding merge-on-read masks apply
  * (deleted rows never reach the Delta files) and rename lineage
  * materializes (files carry the current logical names) — no
  * pre-compact required.
  */
object DeltaExport {

  /** CHECKPOINT a Delta table (ours or anyone's this reader speaks):
    * fold the current log and write the classic columnar checkpoint —
    * protocol / metaData / one `add` row per live file — as
    * `<v>.checkpoint.parquet` plus `_last_checkpoint`, at the highest
    * JSON version. The JSON prefix becomes redundant exactly as
    * Delta's own checkpoints make it (readers reconstruct from
    * checkpoint + suffix; vacuum may truncate the prefix). Returns
    * the checkpointed version.
    *
    * Scale shape: O(files) driver rows through one parquet write —
    * the same budget as the log fold itself.
    */
  def checkpointDelta(spark: SparkSession, deltaPath: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = DeltaImport.foldDeltaLog(spark, deltaPath)
    // This writer does not re-express DeletionVectorDescriptors: a
    // checkpoint that silently dropped them would RESURRECT the
    // masked rows the moment the JSON prefix is vacuumed — refuse
    // loudly instead (the import direction materializes visible
    // rows; checkpoint after that).
    require(st.deletes.isEmpty,
      s"delta table at $deltaPath has ${st.deletes.size} file(s) with " +
        "outstanding deletion vectors — checkpointing would drop the " +
        "masks and resurrect deleted rows; compact (or import, which " +
        "materializes visible rows) first")
    val logDir = Paths.get(deltaPath, "_delta_log")
    val listing = Files.list(logDir)
    val jsonVersionsAll =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).toSeq
      finally listing.close()
    // Only versions PAST the existing checkpoint count: an
    // un-vacuumed JSON prefix would otherwise recompute the same
    // version and the Files.move below would throw
    // FileAlreadyExistsException instead of the documented refusal.
    val ckptDone = {
      val f = logDir.resolve("_last_checkpoint")
      if (!Files.exists(f)) -1L
      else """"version"\s*:\s*(\d+)""".r.unanchored
        .findFirstMatchIn(Files.readString(f))
        .map(_.group(1).toLong).getOrElse(-1L)
    }
    val jsonVersions = jsonVersionsAll.filter(_ > ckptDone)
    require(jsonVersions.nonEmpty,
      s"nothing to checkpoint at $deltaPath: no JSON commits past the " +
        "existing checkpoint")
    val version = jsonVersions.max
    val schema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        // `format` is REQUIRED metaData in the Delta protocol —
        // upstream readers reject a checkpoint without it
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    // the configuration map MUST ride along: dropping
    // delta.columnMapping.mode would make readers (ours included)
    // probe logical names against physical files; the protocol
    // version widens with it
    val mapped =
      st.config.get("delta.columnMapping.mode").exists(_ != "none")
    // createdTime: the earliest surviving commit file's stamp — the
    // closest deterministic proxy this fold has for table creation.
    val createdTime = Files.getLastModifiedTime(
      logDir.resolve(f"${jsonVersionsAll.min}%020d.json")).toMillis
    val rows: Seq[Row] =
      Seq(Row(Row(if (mapped) 2 else 1, if (mapped) 5 else 2), null, null),
        Row(null, Row("graft-checkpoint", Row("parquet",
          Map.empty[String, String]), st.schema.json,
          st.partitionCols, st.config, createdTime), null)) ++
      st.activeFiles.map { case (p, pv) =>
        val f = Paths.get(deltaPath, p)
        // dataChange=false: checkpoint add rows RESTATE state, they
        // do not change it — the protocol requires it and CDF readers
        // would otherwise replay the whole table as inserts
        Row(null, null, Row(p, pv, Files.size(f),
          Files.getLastModifiedTime(f).toMillis, false))
      }
    val tmp = s"$deltaPath/_tmp_checkpoint"
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath,
      logDir.resolve(f"$version%020d.checkpoint.parquet"))
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      s"""{"version":$version,"size":${rows.size}}""")
    version
  }

  private def jesc(x: String) =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Decode Spark's hive partition-directory escaping back to the
    * true value: special characters are percent-encoded (`:`→`%3A`,
    * `=`→`%3D`, ...) and a NULL partition value writes the sentinel
    * directory `__HIVE_DEFAULT_PARTITION__` — emitting either
    * verbatim would hand Delta escaped/sentinel strings instead of
    * the real values. None means the Delta null representation
    * (`"col":null` in partitionValues).
    */
  private[graft] def hiveUnescape(v: String): Option[String] =
    if (v == "__HIVE_DEFAULT_PARTITION__") None
    else {
      val b = new java.lang.StringBuilder(v.length)
      var i = 0
      while (i < v.length) {
        val ch = v.charAt(i)
        if (ch == '%' && i + 2 < v.length &&
            Character.digit(v.charAt(i + 1), 16) >= 0 &&
            Character.digit(v.charAt(i + 2), 16) >= 0) {
          b.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { b.append(ch); i += 1 }
      }
      Some(b.toString)
    }

  def exportDelta(
      spark: SparkSession, graftPath: String, deltaPath: String): Unit = {
    val snap = GraftLake.snapshot(graftPath)
    require(snap.version >= 0, s"no graft table at $graftPath")
    require(!Files.exists(Paths.get(deltaPath, "_delta_log")),
      s"delta table already exists at $deltaPath")
    val schema = StructType.fromDDL(snap.schemaDdl)
    val parts = snap.partitionCols
    // DV-FIDELITY fast path: a table whose only outstanding MoR state
    // is POSITION sidecars exports them as REAL Delta deletion
    // vectors over byte-copied data files — zero data rewritten, the
    // masking travels as inline roaring DVs. Falls back to the
    // materializing path whenever the state cannot be expressed
    // faithfully (partitioned layout, column-mapping lineage,
    // schema-evolved sets, key tombstones).
    if (snap.tombstones.nonEmpty && parts.isEmpty && snap.renames.isEmpty &&
        snap.live.forall(_.schemaDdl == snap.schemaDdl)) {
      val refs = GraftLake.loadScanMaskRefs(graftPath, snap.tombstones)
      if (refs.keyRefs.isEmpty && refs.dvDirs.nonEmpty) {
        exportDeltaWithDvs(spark, graftPath, deltaPath, snap, schema,
          refs.dvDirs)
        return
      }
    }
    val df = GraftLake.read(spark, graftPath)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // ONE distributed pass lays the data down in Delta's directory
    // convention (partition columns as hive dirs, dropped from the
    // files — exactly what partitionValues re-declares).
    if (parts.isEmpty) df.write.parquet(deltaPath)
    else df.write.partitionBy(parts: _*).parquet(deltaPath)

    // Every written part file becomes one `add`, its partition values
    // parsed back from the hive directory names.
    def walkParquet(dir: java.nio.file.Path, pv: Map[String, String])
        : Seq[(String, Map[String, String])] = {
      val listing = Files.list(dir)
      val entries = try listing.iterator().asScala.toSeq finally listing.close()
      entries.sortBy(_.getFileName.toString).flatMap { p =>
        val n = p.getFileName.toString
        if (Files.isDirectory(p) && n.contains("="))
          // the directory KEY is hive-escaped too (column names with
          // special characters); the value decodes at emission time
          walkParquet(p, pv + (hiveUnescape(n.take(n.indexOf('='))).get ->
            n.substring(n.indexOf('=') + 1)))
        else if (n.endsWith(".parquet"))
          Seq(Paths.get(deltaPath).relativize(p).toString -> pv)
        else Seq.empty
      }
    }
    val files = walkParquet(Paths.get(deltaPath), Map.empty)
    require(files.nonEmpty, s"export wrote no parquet files to $deltaPath")
    val adds = files.map { case (rel, pv) =>
      val pvJson = parts.map { pc =>
        pv.get(pc).flatMap(hiveUnescape) match {
          case Some(v) => s""""${jesc(pc)}":"${jesc(v)}""""
          case None => s""""${jesc(pc)}":null"""
        }
      }.mkString(",")
      val f = Paths.get(deltaPath, rel)
      s"""{"add":{"path":"${jesc(rel)}","partitionValues":{$pvJson},""" +
        s""""size":${Files.size(f)},""" +
        s""""modificationTime":${Files.getLastModifiedTime(f).toMillis},""" +
        """"dataChange":true}}"""
    }
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${jesc(schema.json)}",""" +
        s""""partitionColumns":[${parts.map(p => s""""${jesc(p)}"""").mkString(",")}],""" +
        s""""configuration":{},"createdTime":0}}""") ++ adds
    Files.createDirectories(Paths.get(deltaPath, "_delta_log"))
    Files.writeString(Paths.get(deltaPath, "_delta_log", "0" * 20 + ".json"),
      lines.mkString("", "\n", "\n"))
  }

  /** The DV-fidelity export leg: every live set's parquet files
    * BYTE-COPY under their set-relative names (no row rewrite), and
    * each masked file's positions serialize as an INLINE deletion
    * vector (z85 of the portable RoaringBitmapArray — the exact
    * format [[DeltaImport.dvPositions]] reads back). The log is one
    * commit of remove-free adds under the deletionVectors protocol
    * (minReaderVersion 3).
    *
    * DISTRIBUTED: the driver plans only the (set, file) list —
    * O(files) strings — and ONE Spark job does the copies; each task
    * byte-copies its file, loads that file's DV positions from the
    * sidecar descriptors ([[MorMasks.dvPositions]], row-group pruned)
    * and serializes the roaring bitmap executor-side. At 100 TB the
    * copy runs at cluster bandwidth instead of one driver thread,
    * and no position set ever touches the driver — the add lines
    * that return are O(files) metadata.
    */
  private def exportDeltaWithDvs(
      spark: SparkSession, graftPath: String, deltaPath: String,
      snap: GraftLake.Snapshot, schema: StructType,
      dvDirs: Seq[String]): Unit = {
    val fileSpecs: Seq[(String, String)] = snap.live.flatMap { ls =>
      val setDir = Paths.get(GraftLake.setPathOf(graftPath, ls.set))
      val listing = Files.list(setDir)
      val files =
        try listing.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
          }.toSeq.sortBy(_.getFileName.toString)
        finally listing.close()
      files.map(f => (ls.set, f.toString))
    }
    require(fileSpecs.nonEmpty, s"DV export found no parquet files at $graftPath")
    val slices = math.max(1,
      math.min(fileSpecs.size, spark.sparkContext.defaultParallelism))
    val adds = spark.sparkContext
      .parallelize(fileSpecs, slices)
      .map { case (set, src) =>
        val f = Paths.get(src)
        val name = f.getFileName.toString
        val rel = s"$set/$name"
        val dst = Paths.get(deltaPath, rel)
        Files.createDirectories(dst.getParent)
        // REPLACE_EXISTING: byte-copy is idempotent under task retry.
        Files.copy(f, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val poss = MorMasks.dvPositions(dvDirs, set, name)
        val dvJson =
          if (poss.isEmpty) ""
          else {
            val arr = new Array[Long](poss.size)
            val it = poss.iterator()
            var i = 0
            while (it.hasNext) { arr(i) = it.next(); i += 1 }
            val raw = DeltaImport.serializeRoaringArray(arr)
            val padded =
              raw ++ Array.fill((4 - raw.length % 4) % 4)(0.toByte)
            s""","deletionVector":{"storageType":"i",""" +
              s""""pathOrInlineDv":"${DeltaImport.z85Encode(padded)}",""" +
              s""""sizeInBytes":${raw.length},"cardinality":${poss.size}}"""
          }
        rel -> (s"""{"add":{"path":"${jesc(rel)}","partitionValues":{},""" +
          s""""size":${Files.size(dst)},""" +
          s""""modificationTime":${Files.getLastModifiedTime(dst).toMillis},""" +
          s""""dataChange":true$dvJson}}""")
      }
      .collect().sortBy(_._1).map(_._2).toSeq
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${jesc(schema.json)}","partitionColumns":[],""" +
        s""""configuration":{"delta.enableDeletionVectors":"true"},"createdTime":0}}""") ++
      adds
    Files.createDirectories(Paths.get(deltaPath, "_delta_log"))
    Files.writeString(Paths.get(deltaPath, "_delta_log", "0" * 20 + ".json"),
      lines.mkString("", "\n", "\n"))
  }
}
