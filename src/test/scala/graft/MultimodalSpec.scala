package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decodeStub is deterministic and shape-bounded") {
    val bytes = "hello world".getBytes("UTF-8")
    val m1 = Multimodal.decodeStub(7L, bytes)
    val m2 = Multimodal.decodeStub(7L, bytes)
    assert(m1 == m2)
    assert(m1.n_bytes == bytes.length)
    assert(m1.width >= 1 && m1.width <= 64 && m1.height >= 1 && m1.height <= 64)
    assert(m1.feat_sum >= 0 && m1.feat_sum < 997)
  }

  test("decodeStub handles empty payloads") {
    val m = Multimodal.decodeStub(1L, Array.emptyByteArray)
    assert(m.n_bytes == 0 && m.width == 1 && m.height == 1)
  }

  test("m01 emits one metadata row per document") {
    val n = Tables.documents(spark, sf).count()
    val rows = Multimodal.m01MultimodalMeta(spark, sf).collect()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == n)
  }

  test("PNG codec round trip is lossless on the synth pattern") {
    import graft.multimodal.Codec
    val png = Codec.synthFrame(42L, 13, 7, 3)
    // Real PNG bytes on the wire (magic header), and decode restores
    // every pixel of the pattern bit-exactly.
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val img = Codec.decodePng(png)
    assert(img.getWidth == 13 && img.getHeight == 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val g = Codec.grayPx(42L, x, y, 3)
      assert((img.getRGB(x, y) >> 16 & 0xff) == g, s"pixel ($x,$y)")
    }
  }

  test("nearest-neighbor resize picks the exact integer-mapped source pixels") {
    import graft.multimodal.Codec
    val src = Codec.decodePng(Codec.synthFrame(7L, 8, 4, 0))
    val out = Codec.resizeNearest(src, 4, 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val expected = Codec.grayPx(7L, x * 8 / 4, y * 4 / 2, 0)
      assert((out.getRGB(x, y) >> 16 & 0xff) == expected, s"pixel ($x,$y)")
    }
  }

  test("m02 resize: real decode path — geometry and pixel checksum match brute") {
    import graft.multimodal.Codec
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.m02Resize(spark, sf, target = 32).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(math.max(ow, oh) == 32 && ow >= 1 && oh >= 1)
      val t = texts(id)
      assert(w == (t.charAt(0).toInt % 64) + 1 && h == (t.charAt(1).toInt % 64) + 1)
      // Brute arithmetic twin of the decoded-resized-reencoded checksum.
      val expected = (for (x <- 0 until ow; y <- 0 until oh)
        yield Codec.grayPx(id, x * w / ow, y * h / oh, 0).toLong).sum
      assert(r.getAs[Long]("px_sum") == expected, s"doc $id")
    }
  }

  test("m03 frame sampling: stride-4 keeps ceil(n/4) frames, checksums match brute") {
    import graft.multimodal.Codec
    val rows = Multimodal.m03FrameSample(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Int]("n_frames")
      val s = r.getAs[Int]("n_sampled")
      assert(s == (n + 3) / 4)
      val (fw, fh) = (r.getAs[Int]("frame_w"), r.getAs[Int]("frame_h"))
      def frameSum(k: Int): Long =
        (for (x <- 0 until fw; y <- 0 until fh)
          yield Codec.grayPx(id, x, y, k).toLong).sum
      val ks = 0 until n by 4
      assert(r.getAs[Long]("first_px_sum") == (if (ks.isEmpty) 0L else frameSum(0)))
      assert(r.getAs[Long]("sampled_px_sum") == ks.map(frameSum).sum, s"doc $id")
    }
  }

  test("m04 grayscale: luma checksums survive both codec legs and match brute") {
    import graft.multimodal.Codec
    val rows = Multimodal.m04Grayscale(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      var luma = 0L
      var rsum = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val (cr, cg, cb) =
          (Codec.grayPx(id, x, y, 0), Codec.grayPx(id, x, y, 1), Codec.grayPx(id, x, y, 2))
        luma += (299 * cr + 587 * cg + 114 * cb) / 1000
        rsum += cr
      }
      assert(r.getAs[Long]("luma_sum") == luma, s"doc $id")
      // Conversion must be a genuine transform, not the identity on R.
      if (w * h > 4) assert(r.getAs[Long]("luma_sum") != rsum, s"doc $id trivial")
    }
  }

  test("m05 dHash: deterministic through the codec, invariant to brightness shift") {
    import java.awt.image.BufferedImage
    import graft.multimodal.Codec
    def grayOf(f: (Int, Int) => Int, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y))
      img
    }
    val (w, h) = (40, 30)
    def lum(x: Int, y: Int): Int = (x * 31 + y * 17) % 200
    val base = grayOf(lum, w, h)
    // determinism through a real codec round trip (gray PNG decodes
    // back as a single-band raster — dHash reads band 0 either way)
    val viaCodec = Codec.decodePng(Codec.encodePng(grayOf(lum, w, h)))
    assert(Codec.dHash(base) == Codec.dHash(viaCodec))
    // global brightness shift flips NO bit (the dedup invariance)
    val brighter = grayOf((x, y) => math.min(255, lum(x, y) + 40), w, h)
    assert(Codec.dHash(base) == Codec.dHash(brighter))
    // a genuinely different image lands far away in Hamming space
    val other = grayOf((x, y) => (x * 7 + y * 53 + 91) % 200, w, h)
    val (h1, l1) = Codec.dHash(base)
    val (h2, l2) = Codec.dHash(other)
    val dist = Integer.bitCount(h1 ^ h2) + Integer.bitCount(l1 ^ l2)
    assert(dist > 8, s"unrelated images only $dist bits apart")
    // and the gated query returns a hash per document
    val rows = graft.multimodal.Multimodal.m05PHash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
  }

  test("m07 multimodal packing equals a sequential driver fold over text+patch costs") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // Brute reference: one sequential walk accumulating the global
    // token offset; image cost = ViT patch count of the stub dims.
    var off = 0L
    val expect = docs.map { case (id, text) =>
      val nTxt = text.split(" ").count(_.nonEmpty).toLong
      val w = (math.max(if (text.nonEmpty) text.codePointAt(0) else 0, 0) % 64) + 1
      val h = (math.max(if (text.length > 1) text.codePointAt(1) else 0, 0) % 64) + 1
      val imgTok = ((w + 15) / 16) * ((h + 15) / 16).toLong
      val total = nTxt + imgTok
      val start = off
      off += total
      val imgStart = start + nTxt
      (id, nTxt, imgTok, start,
        start / 128, (start + total - 1) / 128,
        (start + total - 1) / 128 - start / 128 + 1,
        imgStart / 128, (imgStart + imgTok - 1) / 128)
    }.toSeq
    val got = Multimodal.m07MultimodalPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(got == expect && got.nonEmpty)
    // Every image span is inside its document span, and spans tile the
    // stream: next doc starts where this one ends.
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 == a._4 + a._2 + a._3)
      case _ => ()
    }
    assert(got.forall(g => g._8 >= g._5 && g._9 <= g._6))
  }

  test("m06 image dedup equals a driver union-find over banded Hamming candidates") {
    val ph = graft.multimodal.Multimodal.m05PHash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    def bands(hl: (Int, Int)): Seq[Int] = {
      val (hi, lo) = hl
      Seq(lo & 0xFFFF, (lo >>> 16) & 0xFFFF, hi & 0xFFFF, (hi >>> 16) & 0xFFFF)
    }
    // Union-find over pairs that share a band AND sit <= 6 bits apart.
    val parent = scala.collection.mutable.Map(ph.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val byBand = ph.keys.toSeq.flatMap(id =>
      bands(ph(id)).zipWithIndex.map { case (bv, t) => ((t, bv), id) })
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    for (bucket <- byBand; i <- bucket.indices; j <- i + 1 until bucket.length) {
      val (a, b) = (bucket(i), bucket(j))
      val d = Integer.bitCount(ph(a)._1 ^ ph(b)._1) +
        Integer.bitCount(ph(a)._2 ^ ph(b)._2)
      if (d <= graft.multimodal.Multimodal.m06MaxHamming) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = ph.keys.map(k => k -> find(k)).toMap
    val got = graft.multimodal.Multimodal.m06ImageDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == ph.size)
    got.foreach { case (id, canon, kept) =>
      assert(canon == want(id), s"doc $id: $canon != ${want(id)}")
      assert(kept == (canon == id))
    }
    // The corpus genuinely contains image near-dups — the op must merge.
    assert(got.exists(!_._3), "expected at least one merged image")
  }
}
