package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

class AvroSpec extends AnyFunSuite with SparkSpec {

  test("avro round trip is value-exact, null-date rows included") {
    val dir = Files.createTempDirectory("graft-avro").toString
    // Inject nulls deterministically — the union-null leg must carry.
    val o = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      when(col("o_orderkey") % 10 === 0, lit(null))
        .otherwise(col("o_orderdate")).as("o_orderdate"))
    AvroIO.write(o, dir)
    val back = AvroIO.read(spark, dir, o.schema)
    assert(back.schema == o.schema)
    assert(back.count() == o.count())
    // Exact multiset equality, both directions.
    assert(back.exceptAll(o).count() == 0)
    assert(o.exceptAll(back).count() == 0)
    // Nulls survived as nulls (orders has null o_orderdate rows).
    val nNull = o.filter(col("o_orderdate").isNull).count()
    assert(nNull > 0, "fixture should include null dates")
    assert(back.filter(col("o_orderdate").isNull).count() == nNull)
  }

  test("write emits one container per partition; read parallelism = files") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-avro-p").toString
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(7)
    val nFiles = AvroIO.write(o, dir)
    val onDisk = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(_.toString.endsWith(".avro"))
    assert(nFiles == onDisk && nFiles == 7)
    val back = AvroIO.read(spark, dir, o.schema)
    assert(back.rdd.getNumPartitions == 7, "one read task per container file")
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      o.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("containers are standard Avro: schema embedded, readable without the writer's schema") {
    val dir = Files.createTempDirectory("graft-avro-s").toString
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus")).limit(100).coalesce(1)
    AvroIO.write(o, dir)
    // Open with a schema-less GenericDatumReader: the container header
    // must carry everything needed (cross-engine interchange contract).
    import scala.jdk.CollectionConverters._
    val f = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.toString.endsWith(".avro")).get.toFile
    val r = new org.apache.avro.file.DataFileReader(
      f, new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val first = r.next()
    assert(first.getSchema.getField("o_orderkey") != null)
    assert(r.getSchema.getFields.size() == 2)
    r.close()
  }
}
