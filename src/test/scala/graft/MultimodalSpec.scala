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
}
