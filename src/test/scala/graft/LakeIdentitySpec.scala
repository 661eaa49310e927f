package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** IDENTITY columns (Delta's GENERATED ALWAYS AS IDENTITY): values
  * allocated as start + step × ordinal off the row-tracking high
  * water — race-free monotone ranges claimed inside the publish loop,
  * so concurrent writers never produce duplicate values; explicit
  * values refuse; the (start, step) coldef rides checkpoints and
  * clones.
  */
class LakeIdentitySpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-identity").resolve("t").toString

  test("SQL CREATE ... IDENTITY allocates start + step*k across inserts") {
    val p = fresh()
    spark.sql(
      s"""CREATE TABLE id_t (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
         |  v BIGINT
         |) USING graftlake LOCATION '$p'
         |TBLPROPERTIES ('statscol'='v')""".stripMargin)
    assert(GraftLake.identityColumnsOf(p) == Map("id" -> (100L, 3L)))
    assert(GraftLake.rowTrackingEnabled(p))
    spark.sql("INSERT INTO id_t (v) VALUES (10), (20), (30)")
    spark.sql("INSERT INTO id_t (v) VALUES (40), (50)")
    val got = spark.sql("SELECT id, v FROM id_t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential inserts: ids are exactly {100 + 3k, k in 0..4}
    assert(got.keySet == (0 until 5).map(k => 100L + 3L * k).toSet)
    assert(got.values.toSeq.sorted == Seq(10L, 20L, 30L, 40L, 50L))
    // the coldef survives a checkpoint
    GraftLake.checkpoint(p)
    assert(GraftLake.identityColumnsOf(p) == Map("id" -> (100L, 3L)))
    spark.sql("INSERT INTO id_t (v) VALUES (60)")
    assert(spark.sql("SELECT max(id) FROM id_t").head.getLong(0) == 115L)
    // property surface
    val prop = spark.sql("SHOW TBLPROPERTIES id_t")
      .filter(col("key") === "identity.id").head.getString(1)
    assert(prop == "START WITH 100 INCREMENT BY 3")
    // explicit values refuse — ALWAYS generated
    val err = intercept[Exception] {
      spark.sql("INSERT INTO id_t (id, v) VALUES (9, 9)")
    }
    assert(err.getMessage.contains("IDENTITY"))
    // identity values are append-allocated: OVERWRITE refuses
    val err2 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE id_t SELECT v FROM id_t")
    }
    assert(err2.getMessage.contains("IDENTITY"))
    LakeSql.unregister("id_t")
  }

  test("racing writers never allocate overlapping identity values") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val p = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"))
    GraftLake.enableRowTracking(p)
    GraftLake.recordColDefs(p, Seq.empty, Seq.empty,
      Seq("id" -> (1000L, 7L)))
    Await.result(Future.sequence((1 to 4).map(w => Future {
      GraftLake.appendIdentity(
        Seq.tabulate(25)(i => w * 10000L + i).toDF("v"), p, Some("v"))
    })), 180.seconds)
    val ids = GraftLake.read(spark, p)
      .select(col("id")).collect().map(_.getLong(0))
    assert(ids.length == 100)
    assert(ids.distinct.length == 100, "identity values must be unique")
    // every value follows the arithmetic (gaps allowed, duplicates not)
    assert(ids.forall(v => v >= 1000L && (v - 1000L) % 7L == 0L))
  }

  test("identity needs row tracking; a shallow clone keeps allocating uniquely") {
    import spark.implicits._
    val p = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"))
    val err = intercept[IllegalArgumentException] {
      GraftLake.recordColDefs(p, Seq.empty, Seq.empty, Seq("id" -> (0L, 1L)))
    }
    assert(err.getMessage.contains("row tracking"))
    GraftLake.enableRowTracking(p)
    GraftLake.recordColDefs(p, Seq.empty, Seq.empty, Seq("id" -> (0L, 1L)))
    GraftLake.appendIdentity(Seq(1L, 2L, 3L).toDF("v"), p, Some("v"))
    val dst = Files.createTempDirectory("graft-identity-clone")
      .resolve("c").toString
    GraftLake.shallowClone(p, dst)
    assert(GraftLake.identityColumnsOf(dst) == Map("id" -> (0L, 1L)))
    GraftLake.appendIdentity(Seq(4L, 5L).toDF("v"), dst, Some("v"))
    val cloneIds = GraftLake.read(spark, dst)
      .select(col("id")).collect().map(_.getLong(0))
    assert(cloneIds.length == 5 && cloneIds.distinct.length == 5,
      s"clone ids must stay unique, got ${cloneIds.sorted.toSeq}")
  }
}
