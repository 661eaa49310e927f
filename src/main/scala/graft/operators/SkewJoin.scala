package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit tool for the pathological case (one key holding a double-
  * digit percentage of the fact table, or skew under a non-AQE-
  * splittable operation). The left (skewed/fact) side gets a
  * deterministic per-row salt; the right (dim) side is replicated
  * once per salt value, so each (key, salt) shuffle bucket carries
  * ~1/numSalts of the hot key's rows.
  *
  * Cost: right side inflates x numSalts — use only when the right
  * side is small relative to the skew being split.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    // Right-preserving join types would emit numSalts copies of every
    // unmatched right row (the right side is replicated per salt).
    val supported =
      Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support right-preserving joinType '$joinType'")
    // Per-row deterministic salt from the full row content (a salt
    // derived only from the key would keep the hot key in one bucket).
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(numSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
