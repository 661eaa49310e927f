package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns.
  *
  * Pure `Column`-expression implementations (zip_with / aggregate) keep
  * everything inside Catalyst codegen; [[graft.plans.CosineSim]] is the
  * native-Expression fast path registered via GraftExtensions.
  */
object VectorFunctions {

  /** Dot product of two float-array columns (codegen'd higher-order fn). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm of a float-array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity via composed built-ins (baseline path). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Native codegen'd cosine similarity (fast path). */
  def cosineSimNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Bounded top-k aggregate (map-side partial; see
    * [[graft.plans.TopKByScore]]). Returns array<struct<id,score>>
    * sorted best-first.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.TopKByScore(
        GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
  }

  /** Mergeable KLL-style quantile sketch (map-side partial; exact
    * below capacity — see [[graft.plans.QuantileSketch]]). Returns
    * array<double>, one entry per requested fraction.
    */
  def quantileSketch(value: Column, percentages: Seq[Double],
      capacity: Int = graft.plans.QuantileSketch.DefaultCapacity): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.QuantileSketch(
        GraftBridge.expression(value), percentages, capacity)
        .toAggregateExpression())
  }

  /** SpaceSaving heavy-hitters aggregate (map-side partial; exact
    * below capacity — see [[graft.plans.FrequentItems]]). Returns
    * array<struct<item,cnt>> best-first.
    */
  def heavyHitters(value: Column, k: Int,
      capacity: Int = graft.plans.FrequentItems.DefaultCapacity): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.FrequentItems(
        GraftBridge.expression(value), k, capacity)
        .toAggregateExpression())
  }

  /** Distributed Bloom-filter build over a long column (bitwise-OR
    * merge — byte-deterministic; see [[graft.plans.BloomAgg]]).
    * Returns binary: the packed bit words.
    */
  def bloomAgg(value: Column, numWords: Int,
      k: Int = graft.plans.GraftBloom.DefaultK): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.BloomAgg(GraftBridge.expression(value), numWords, k)
        .toAggregateExpression())
  }

  private def literalInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def literalDoubleArray(e: Expression): Seq[Double] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, Decimal, DecimalType, DoubleType}
    require(e.foldable, s"percentages must be a foldable array literal, got $e")
    (e.dataType, e.eval(null)) match {
      case (ArrayType(DoubleType, _), a: ArrayData) => a.toDoubleArray.toSeq
      case (ArrayType(dt: DecimalType, _), a: ArrayData) =>
        a.toArray[Decimal](dt).map(_.toDouble).toSeq
      case other => throw new IllegalArgumentException(
        s"percentages must be array<double> or array<decimal>, got $other")
    }
  }

  /** SQL registrations consumed by GraftExtensions. */
  def registrations: Map[FunctionIdentifier, (ExpressionInfo, Seq[Expression] => Expression)] =
    Map(
      FunctionIdentifier("graft_cosine_sim") -> ((
        new ExpressionInfo(classOf[graft.plans.CosineSim].getName, "graft_cosine_sim"),
        (exprs: Seq[Expression]) => graft.plans.CosineSim(exprs(0), exprs(1)))),
      // Aggregates return the bare AggregateFunction — the analyzer
      // wraps it in an AggregateExpression, as for built-ins.
      FunctionIdentifier("graft_topk_by_score") -> ((
        new ExpressionInfo(classOf[graft.plans.TopKByScore].getName, "graft_topk_by_score"),
        (exprs: Seq[Expression]) => graft.plans.TopKByScore(
          exprs(0), exprs(1), literalInt(exprs(2), "k")))),
      FunctionIdentifier("graft_quantile_sketch") -> ((
        new ExpressionInfo(classOf[graft.plans.QuantileSketch].getName, "graft_quantile_sketch"),
        (exprs: Seq[Expression]) => {
          val capacity =
            if (exprs.size > 2) literalInt(exprs(2), "capacity")
            else graft.plans.QuantileSketch.DefaultCapacity
          graft.plans.QuantileSketch(exprs(0), literalDoubleArray(exprs(1)), capacity)
        })),
      FunctionIdentifier("graft_heavy_hitters") -> ((
        new ExpressionInfo(classOf[graft.plans.FrequentItems].getName, "graft_heavy_hitters"),
        (exprs: Seq[Expression]) => {
          val capacity =
            if (exprs.size > 2) literalInt(exprs(2), "capacity")
            else graft.plans.FrequentItems.DefaultCapacity
          graft.plans.FrequentItems(
            exprs(0), literalInt(exprs(1), "k"), capacity)
        })),
      FunctionIdentifier("graft_bloom_agg") -> ((
        new ExpressionInfo(classOf[graft.plans.BloomAgg].getName, "graft_bloom_agg"),
        (exprs: Seq[Expression]) => {
          val k = if (exprs.size > 2) literalInt(exprs(2), "k")
            else graft.plans.GraftBloom.DefaultK
          graft.plans.BloomAgg(exprs(0), literalInt(exprs(1), "numWords"), k)
        })))
}
