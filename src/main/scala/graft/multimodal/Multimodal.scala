package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** JDK-only real image codec (javax.imageio PNG): the decode / resize /
  * re-encode boundary for the multimodal operators. No external libs —
  * PNG is lossless, so a synthesized pattern survives encode → decode →
  * resample → re-encode → decode bit-exactly, which is what lets the
  * SQL oracle predict pixel checksums arithmetically.
  */
object Codec {
  // ImageIO defaults to a disk-backed stream cache; these are tiny
  // in-memory images on executor threads — keep it off the filesystem.
  ImageIO.setUseCache(false)

  /** Deterministic gray level of pixel (x, y) in frame k of media item
    * `id` — the pattern the synthesizer paints and the oracle replays.
    */
  def grayPx(id: Long, x: Int, y: Int, k: Int): Int =
    (((x * 31 + y * 17 + k * 7).toLong + id * 13L) % 256L).toInt

  /** A real PNG: w x h RGB image painted with [[grayPx]]. Pixels are
    * written straight into the 3BYTE_BGR backing array — per-pixel
    * setRGB goes through ColorModel translation and is the measured
    * hot spot of the whole m02 pass.
    */
  def synthFrame(id: Long, w: Int, h: Int, k: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayPx(id, x, y, k).toByte
        val i = (y * w + x) * 3
        buf(i) = g; buf(i + 1) = g; buf(i + 2) = g
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Nearest-neighbor resample with the integer source mapping
    * srcX = x * w / outW — platform-independent (Graphics2D
    * interpolation is not), so the oracle can replay it exactly.
    */
  def resizeNearest(src: BufferedImage, outW: Int, outH: Int): BufferedImage = {
    val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        out.setRGB(x, y, src.getRGB(x * src.getWidth / outW, y * src.getHeight / outH))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Sum of the red channel over all pixels (channels are equal for the
    * gray pattern) — the replayable content checksum. One bulk raster
    * read per image instead of w x h getRGB ColorModel translations.
    */
  def pxSum(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    // Band 0 of the decoded raster is R for every RGB-family layout
    // ImageIO produces here; channels are equal anyway for the gray
    // pattern.
    val samples = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
    var s = 0L
    var i = 0
    while (i < samples.length) { s += samples(i); i += 1 }
    s
  }

  /** A real COLOR PNG: channel c of pixel (x, y) = [[grayPx]](id,x,y,c)
    * — three distinct channel patterns, so grayscale conversion is a
    * genuine transform (on the gray pattern it would be the identity).
    */
  def synthColorFrame(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3 // backing array is BGR
        buf(i) = grayPx(id, x, y, 2).toByte
        buf(i + 1) = grayPx(id, x, y, 1).toByte
        buf(i + 2) = grayPx(id, x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** 64-bit difference hash of a grayscale image as two signed 32-bit
    * halves: bit i (x = i%8, y = i/8) is set iff the 9×8-grid luma at
    * (x, y) is darker than at (x+1, y), with the grid sampled by the
    * same integer nearest mapping as [[resizeNearest]]. Horizontal
    * gradients survive global brightness shifts — the invariance that
    * makes dHash a DEDUP key rather than a checksum.
    */
  def dHash(gray: BufferedImage): (Int, Int) = {
    val (w, h) = (gray.getWidth, gray.getHeight)
    val raster = gray.getRaster
    var hi = 0
    var lo = 0
    var i = 0
    while (i < 64) {
      val (x, y) = (i % 8, i / 8)
      val l1 = raster.getSample(x * w / 9, y * h / 8, 0)
      val l2 = raster.getSample((x + 1) * w / 9, y * h / 8, 0)
      if (l1 < l2) {
        if (i < 32) lo |= 1 << i else hi |= 1 << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Color → 8-bit grayscale via INTEGER BT.601 luma
    * (299R + 587G + 114B) / 1000 — integer division, not the float
    * ColorConvertOp, so the oracle replays every output pixel exactly.
    */
  def toGray(src: BufferedImage): BufferedImage = {
    val w = src.getWidth
    val h = src.getHeight
    val r = src.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
    val g = src.getRaster.getSamples(0, 0, w, h, 1, null: Array[Int])
    val b = src.getRaster.getSamples(0, 0, w, h, 2, null: Array[Int])
    val lum = new Array[Int](w * h)
    var i = 0
    while (i < lum.length) {
      lum(i) = (299 * r(i) + 587 * g(i) + 114 * b(i)) / 1000
      i += 1
    }
    val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    out.getRaster.setSamples(0, 0, w, h, 0, lum)
    out
  }
}

/** Multimodal-column plumbing (SURVEY.md §2: m01..m03).
  *
  * Media is modeled as an opaque `binary` column + typed metadata —
  * the pattern a 100 TB training-data pipeline uses for image/audio/
  * video payloads. m01 gates the raw binary→metadata plumbing with a
  * stub header decode; m02/m03 run a REAL codec ([[Codec]],
  * javax.imageio PNG): synthesize genuine PNG payloads into the binary
  * column, decode, resample / frame-sample, re-encode. All passes are
  * partition-parallel mapPartitions (codec init amortized per
  * partition, the shape a vectorized UDF has), and payload dims /
  * pixel patterns are deterministic arithmetic so the DuckDB oracle
  * predicts every output column including pixel checksums.
  */
object Multimodal {

  /** Codepoint of the 0-based idx-th CHARACTER, clamped to >= 0 —
    * mirrors the oracles' greatest(unicode(text[idx+1:idx+1]), 0)
    * exactly: codepoints (not UTF-16 units, so non-BMP headers agree
    * between engines) and 0 for a missing/empty slice (DuckDB's
    * unicode('') is -1; both sides clamp so an empty document yields
    * a well-defined 1-pixel dimension instead of engine-divergent
    * negatives). Identity-equal to the old charAt path on ASCII.
    */
  private[multimodal] def headerCp(text: String, idx: Int): Int = {
    val n = text.codePointCount(0, text.length)
    if (n <= idx) 0
    else math.max(text.codePointAt(text.offsetByCodePoints(0, idx)), 0)
  }

  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, feat_sum: Long)

  /** STUB header decoder used by m01 only — m01 gates the binary-column
    * plumbing itself (arbitrary payload bytes → typed metadata), not a
    * specific codec; m02/m03 use the real [[Codec]].
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    MediaMeta(id, bytes.length, (b0 % 64) + 1, (b1 % 64) + 1, 3, s % 997)
  }

  /** m01: binary payload -> typed media metadata.
    * mapPartitions keeps the decode batch-shaped (one iterator per
    * partition — codec init amortized across the partition, the same
    * shape a vectorized/Arrow UDF would have).
    */
  private def decodedMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  def m01MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodedMeta(spark, dir).orderBy("doc_id")

  case class ResizedMeta(
      doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, scale_x: Double, scale_y: Double,
      px_sum: Long)

  /** m02: REAL image resize. Stage 1 synthesizes a genuine PNG payload
    * per document (dims from the text header chars — the same
    * arithmetic the oracle twin uses — pixels from [[Codec.grayPx]]);
    * stage 2 decodes it with javax.imageio, nearest-neighbor resamples
    * to an aspect-preserving target, re-encodes, decodes the re-encoded
    * image and checksums its pixels. PNG is lossless, so `px_sum` is
    * pure arithmetic to the oracle while the bytes on the wire are a
    * real codec round trip.
    */
  def m02Resize(spark: SparkSession, dir: String, target: Int = 32): DataFrame = {
    import spark.implicits._
    val payloads = graft.operators.Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c0 = headerCp(text, 0)
        val c1 = headerCp(text, 1)
        (id, Codec.synthFrame(id, (c0 % 64) + 1, (c1 % 64) + 1, 0))
      })
      .toDF("doc_id", "payload") // the opaque binary media column
    payloads.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val img = Codec.decodePng(png)
        val (w, h) = (img.getWidth, img.getHeight)
        val s = target.toDouble / math.max(w, h)
        val ow = math.max(1, math.round(w * s).toInt)
        val oh = math.max(1, math.round(h * s).toInt)
        val resized = Codec.resizeNearest(img, ow, oh)
        val resizedPng = Codec.encodePng(resized) // the re-encoded wire bytes
        val sc = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        // Checksum the resized raster directly: decode(encode(x)) == x is
        // spec-proven (PNG lossless), so re-decoding here only re-buys
        // what the codec round-trip spec already guarantees.
        require(resizedPng.nonEmpty)
        ResizedMeta(id, w, h, ow, oh, sc, sc, Codec.pxSum(resized))
      })
      .toDF()
      .orderBy("doc_id")
  }

  case class GrayMeta(
      doc_id: Long, width: Int, height: Int, luma_sum: Long)

  /** m04: REAL color → grayscale conversion. Synthesizes a genuine
    * COLOR PNG per document (three distinct channel patterns), decodes
    * it, converts with the integer BT.601 luma, re-encodes as 8-bit
    * gray PNG, RE-DECODES the wire bytes and checksums — the full
    * round trip runs through javax.imageio both ways, and because both
    * codec legs are lossless and the luma is integer arithmetic, the
    * checksum is pure arithmetic to the oracle. Same partition-parallel
    * mapPartitions shape as m02.
    */
  def m04Grayscale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = graft.operators.Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c0 = headerCp(text, 0)
        val c1 = headerCp(text, 1)
        (id, Codec.synthColorFrame(id, (c0 % 64) + 1, (c1 % 64) + 1))
      })
      .toDF("doc_id", "payload")
    payloads.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val img = Codec.decodePng(png)
        val gray = Codec.toGray(img)
        val wire = Codec.encodePng(gray)
        val back = Codec.decodePng(wire) // prove the gray wire bytes
        GrayMeta(id, img.getWidth, img.getHeight, Codec.pxSum(back))
      })
      .toDF()
      .orderBy("doc_id")
  }

  case class FrameSample(
      doc_id: Long, n_frames: Int, n_sampled: Int,
      frame_w: Int, frame_h: Int, first_px_sum: Long, sampled_px_sum: Long)

  /** m03: REAL frame sampling (video analog). The payload is an
    * array<binary> of genuine PNG frames (ceil(chars/frameBytes) of
    * them, dims from the header chars); every `stride`-th frame is
    * kept and ONLY those are decoded — at 100 TB the sampling is what
    * makes the decode affordable, so the plan must reflect it.
    * Checksums over the decoded frames are oracle-replayable
    * arithmetic.
    */
  def m03FrameSample(
      spark: SparkSession, dir: String,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    val videos = graft.operators.Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c0 = headerCp(text, 0)
        val c1 = headerCp(text, 1)
        val fw = (c0 % 16) + 1
        val fh = (c1 % 16) + 1
        // Codepoint count, matching the oracle's length(text) (DuckDB
        // counts characters, not UTF-16 units).
        val nChars = text.codePointCount(0, text.length)
        val nFrames = (nChars + frameBytes - 1) / frameBytes
        (id, fw, fh, Array.tabulate(nFrames)(k => Codec.synthFrame(id, fw, fh, k)))
      })
      .toDF("doc_id", "frame_w", "frame_h", "frames")
    videos.as[(Long, Int, Int, Array[Array[Byte]])]
      .mapPartitions(_.map { case (id, fw, fh, frames) =>
        val sampled = frames.indices.collect {
          case k if k % stride == 0 => frames(k)
        }
        val imgs = sampled.map(Codec.decodePng) // decode ONLY the sample
        val sums = imgs.map(Codec.pxSum)
        FrameSample(id, frames.length, sampled.length, fw, fh,
          if (sums.isEmpty) 0L else sums.head, sums.sum)
      })
      .toDF()
      .orderBy("doc_id")
  }

  case class PHashMeta(
      doc_id: Long, width: Int, height: Int, phash_hi: Int, phash_lo: Int)

  /** m05: perceptual dHash through the REAL codec path — the
    * image-dedup primitive (near-identical images collide; compare
    * hashes by Hamming distance). Synthesize the color PNG, decode,
    * integer-BT.601 grayscale, then the difference hash: sample a 9×8
    * grid with the SAME integer nearest mapping as [[Codec.resizeNearest]]
    * (srcX = x·w/9), bit i = L(x,y) < L(x+1,y). Integer arithmetic end
    * to end, split into two 32-bit halves so no sign bit is ever
    * ambiguous between engines. Per-image cost is 72 luma reads after
    * the decode — at 100 TB the decode dominates and stays
    * partition-parallel.
    */
  def m05PHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = graft.operators.Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c0 = headerCp(text, 0)
        val c1 = headerCp(text, 1)
        (id, Codec.synthColorFrame(id, (c0 % 64) + 1, (c1 % 64) + 1))
      })
      .toDF("doc_id", "payload")
    payloads.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val gray = Codec.toGray(Codec.decodePng(png))
        val (hi, lo) = Codec.dHash(gray)
        PHashMeta(id, gray.getWidth, gray.getHeight, hi, lo)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** m06: IMAGE NEAR-DUP DETECTION — the multimodal dedup operator:
    * m05's perceptual dHash (through the REAL codec) keyed into
    * BANDED Hamming buckets (d07's SimHash machinery on image
    * hashes): 64 bits → 4×16-bit bands, images sharing ANY band
    * collide, the Hamming verify runs on collided pairs only
    * (≤ [[m06MaxHamming]] bits apart = near-duplicate), and
    * connected components canonicalize via the shared adaptive CC.
    * One decode pass + an equi-join on (band, signature) — never an
    * all-pairs image comparison, which is what makes image dedup
    * feasible over a 100 TB media corpus.
    */
  val m06MaxHamming = 6

  def m06ImageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ph = graft.operators.Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c0 = headerCp(text, 0)
        val c1 = headerCp(text, 1)
        val png = Codec.synthColorFrame(id, (c0 % 64) + 1, (c1 % 64) + 1)
        val gray = Codec.toGray(Codec.decodePng(png))
        val (hi, lo) = Codec.dHash(gray)
        (id, hi, lo)
      })
      .toDF("doc_id", "hi", "lo")
      .localCheckpoint(true)
    val banded = ph.select(col("doc_id"), col("hi"), col("lo"),
      posexplode(array(
        col("lo").bitwiseAND(lit(65535)),
        shiftrightunsigned(col("lo"), 16).bitwiseAND(lit(65535)),
        col("hi").bitwiseAND(lit(65535)),
        shiftrightunsigned(col("hi"), 16).bitwiseAND(lit(65535)))))
      .toDF("doc_id", "hi", "lo", "t", "band")
    val a = banded.select(col("t"), col("band"), col("doc_id").as("a"),
      col("hi").as("a_hi"), col("lo").as("a_lo"))
    val b = banded.select(col("t"), col("band"), col("doc_id").as("b"),
      col("hi").as("b_hi"), col("lo").as("b_lo"))
    // Mask to the unsigned-32 space BEFORE xor: Spark widens mixed-sign
    // int xor to 64 bits, where sign extension adds 32 phantom bits to
    // the count.
    def u32(c: org.apache.spark.sql.Column) =
      c.cast("long").bitwiseAND(lit(4294967295L))
    val dups = a.join(b, Seq("t", "band"))
      .filter(col("a") < col("b"))
      .select("a", "b", "a_hi", "a_lo", "b_hi", "b_lo").distinct()
      .withColumn("hx", u32(col("a_hi")).bitwiseXOR(u32(col("b_hi"))))
      .withColumn("lx", u32(col("a_lo")).bitwiseXOR(u32(col("b_lo"))))
      .filter(expr("bit_count(hx) + bit_count(lx)") <= m06MaxHamming)
      .select(col("a"), col("b"))
    graft.operators.Dedup.canonicalizeComponents(
      ph.select(col("doc_id").as("id")), dups)
      .select(col("id").as("doc_id"), col("canonical_id"),
        (col("canonical_id") === col("id")).as("kept"))
      .orderBy("doc_id")
  }

  /** m05's bit replay + band signatures + bit-list Hamming + the
    * shared recursive-CTE CC walk.
    */
  val m06OracleSql: String =
    s"""WITH RECURSIVE meta AS (
       |  SELECT doc_id,
       |    CAST((greatest(unicode(text[1:1]), 0) % 64) + 1 AS INT) AS width,
       |    CAST((greatest(unicode(text[2:2]), 0) % 64) + 1 AS INT) AS height
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, width, height,
       |    [CASE WHEN
       |       (299 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + doc_id * 13) % 256)
       |        + 587 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 7 + doc_id * 13) % 256)
       |        + 114 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 14 + doc_id * 13) % 256)) // 1000
       |       <
       |       (299 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + doc_id * 13) % 256)
       |        + 587 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 7 + doc_id * 13) % 256)
       |        + 114 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 14 + doc_id * 13) % 256)) // 1000
       |     THEN 1 ELSE 0 END FOR i IN range(64)] AS b
       |  FROM meta),
       |bands AS (
       |  SELECT doc_id, t,
       |    list_sum([b[16 * t + i + 1] * (1 << i) FOR i IN range(16)]) AS band
       |  FROM bits CROSS JOIN (SELECT unnest(range(0, 4)) AS t)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.t = b.t AND a.band = b.band
       |  WHERE a.doc_id < b.doc_id),
       |dups AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN bits ba ON ba.doc_id = doc_a
       |  JOIN bits bb ON bb.doc_id = doc_b
       |  WHERE list_sum([CASE WHEN ba.b[i + 1] <> bb.b[i + 1] THEN 1 ELSE 0 END
       |                  FOR i IN range(64)]) <= $m06MaxHamming),
       |docs AS (SELECT doc_id FROM meta),
       |${graft.operators.Dedup.ccSql}
       |SELECT doc_id, canonical_id, canonical_id = doc_id AS kept
       |FROM canon ORDER BY doc_id""".stripMargin

  /** Arithmetic replay of m05: PNG is lossless and the luma/grid maps
    * are integer, so every bit is a pure function of (doc_id, dims).
    */
  val m05OracleSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    CAST((greatest(unicode(text[1:1]), 0) % 64) + 1 AS INT) AS width,
      |    CAST((greatest(unicode(text[2:2]), 0) % 64) + 1 AS INT) AS height
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id, width, height,
      |    [CASE WHEN
      |       (299 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + doc_id * 13) % 256)
      |        + 587 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 7 + doc_id * 13) % 256)
      |        + 114 * (((i % 8) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 14 + doc_id * 13) % 256)) // 1000
      |       <
      |       (299 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + doc_id * 13) % 256)
      |        + 587 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 7 + doc_id * 13) % 256)
      |        + 114 * (((i % 8 + 1) * width // 9 * 31 + (i // 8) * height // 8 * 17 + 14 + doc_id * 13) % 256)) // 1000
      |     THEN 1 ELSE 0 END FOR i IN range(64)] AS b
      |  FROM meta)
      |SELECT doc_id, width, height,
      |  CAST(list_sum([b[i + 1] * (1 << (i - 32)) FOR i IN range(32, 64)])
      |    - CASE WHEN b[64] = 1 THEN 4294967296 ELSE 0 END AS INT) AS phash_hi,
      |  CAST(list_sum([b[i + 1] * (1 << i) FOR i IN range(32)])
      |    - CASE WHEN b[32] = 1 THEN 4294967296 ELSE 0 END AS INT) AS phash_lo
      |FROM bits ORDER BY doc_id""".stripMargin

  /** Context window (tokens) and ViT patch size for m07's packing. */
  val PackCap = 128L
  val PatchPx = 16L

  /** m07: INTERLEAVED MULTIMODAL SEQUENCE PACKING — d25's
    * concat-and-chunk prefix-sum packing extended to the shape
    * multimodal training corpora actually feed the loader: each
    * document is a text segment FOLLOWED by its image, and the image
    * costs TOKEN-EQUIVALENTS from m01's typed metadata — the
    * vision-transformer patch count ceil(w/16)·ceil(h/16) (exact
    * integer `div` arithmetic, 1..16 tokens for the stub's 1..64-px
    * sides). The global offset is the SAME distributed two-pass
    * prefix sum as d25 ([[graft.operators.Ranks.withRunningTotal]] —
    * range partition + broadcast offsets, no unpartitioned window),
    * now over the combined text+image cost; per document the report
    * pins the full span AND the image sub-span's chunk placement (the
    * loader needs to know which context windows carry pixels).
    */
  def m07MultimodalPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cap = PackCap
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      // d25's whitespace token count for the text segment.
      size(filter(split(col("text"), " "), x => length(x) > 0))
        .cast("long").as("n_txt"),
      // m01's stub metadata arithmetic (ASCII texts: byte == codepoint).
      ((greatest(ascii(substring(col("text"), 1, 1)), lit(0)) % 64) + 1)
        .cast("long").as("img_w"),
      ((greatest(ascii(substring(col("text"), 2, 1)), lit(0)) % 64) + 1)
        .cast("long").as("img_h"))
      .withColumn("img_tok",
        expr(s"((img_w + ${PatchPx - 1}) div $PatchPx) * " +
          s"((img_h + ${PatchPx - 1}) div $PatchPx)"))
      // coalesce against a non-nullable literal: the prefix sum
      // requires a provably non-null Long value column.
      .withColumn("n_total",
        coalesce(col("n_txt") + col("img_tok"), lit(0L)))
    graft.operators.Ranks
      .withRunningTotal(docs, Seq(col("doc_id")), "n_total", "tok_start")
      // img_tok >= 1 always, so every document has a non-empty span.
      .withColumn("start_chunk", expr(s"tok_start div $cap"))
      .withColumn("end_chunk",
        expr(s"(tok_start + n_total - 1) div $cap"))
      .withColumn("n_chunks", col("end_chunk") - col("start_chunk") + 1)
      .withColumn("img_start", col("tok_start") + col("n_txt"))
      .withColumn("img_chunk_start", expr(s"img_start div $cap"))
      .withColumn("img_chunk_end",
        expr(s"(img_start + img_tok - 1) div $cap"))
      .select(col("doc_id"), col("n_txt"), col("img_tok"), col("tok_start"),
        col("start_chunk"), col("end_chunk"), col("n_chunks"),
        col("img_chunk_start"), col("img_chunk_end"))
      .orderBy(col("doc_id"))
  }

  /** d25's window-cumsum replay over the combined text+image cost,
    * image patch arithmetic identical.
    */
  val m07OracleSql: String =
    s"""WITH c AS (SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_txt,
      |    CAST((greatest(unicode(text[1:1]), 0) % 64) + 1 AS BIGINT) AS img_w,
      |    CAST((greatest(unicode(text[2:2]), 0) % 64) + 1 AS BIGINT) AS img_h
      |  FROM documents),
      |k AS (SELECT doc_id, n_txt,
      |    ((img_w + 15) // 16) * ((img_h + 15) // 16) AS img_tok
      |  FROM c),
      |t AS (SELECT doc_id, n_txt, img_tok, n_txt + img_tok AS n_total,
      |    CAST(coalesce(sum(n_txt + img_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
      |  FROM k)
      |SELECT doc_id, n_txt, CAST(img_tok AS BIGINT) AS img_tok, tok_start,
      |  CAST(tok_start // 128 AS BIGINT) AS start_chunk,
      |  CAST((tok_start + n_total - 1) // 128 AS BIGINT) AS end_chunk,
      |  CAST((tok_start + n_total - 1) // 128 - tok_start // 128 + 1 AS BIGINT) AS n_chunks,
      |  CAST((tok_start + n_txt) // 128 AS BIGINT) AS img_chunk_start,
      |  CAST((tok_start + n_txt + img_tok - 1) // 128 AS BIGINT) AS img_chunk_end
      |FROM t ORDER BY doc_id""".stripMargin
}
