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

  test("m02 resize: longest edge hits the target, aspect preserved") {
    val rows = Multimodal.m02Resize(spark, sf, target = 32).collect()
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(math.max(w, h) == 32)
      assert(w >= 1 && h >= 1)
    }
  }

  test("m03 frame sampling: stride-4 keeps ceil(n/4) frames") {
    val rows = Multimodal.m03FrameSample(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val s = r.getAs[Int]("n_sampled")
      assert(s == (n + 3) / 4)
    }
  }
}
