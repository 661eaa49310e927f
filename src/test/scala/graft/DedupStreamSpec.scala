package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.DedupStream

class DedupStreamSpec extends AnyFunSuite with SparkSpec {

  test("st18 keeps exactly the greedy survivors: in-batch exact winners with no band collision to earlier batches") {
    val out = DedupStream.st18StreamNearDedup(spark, sf).collect()
    assert(out.nonEmpty && out.forall(_.getBoolean(2)))
    val kept = out.map(_.getLong(0)).toSet

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), lower(trim(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bands = Dedup.bandRowsOf(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // Greedy reference fold over the three arrival batches.
    var index = Set.empty[(Int, Long)]
    val expect = scala.collection.mutable.Set.empty[Long]
    (0 to 2).foreach { k =>
      val batch = docs.filter(_._1 % 3 == k)
      val exactWinners = batch.groupBy(_._3).values.map(_.minBy(_._1)._1).toSet
      val survivors = exactWinners.filter(id => (bands(id) & index).isEmpty)
      expect ++= survivors
      index = index ++ survivors.flatMap(bands)
    }
    assert(kept == expect.toSet)
    // And the filter genuinely fired: the corpus has duplicates.
    assert(kept.size < docs.length)
  }
}
