package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join, demonstrated at the full custom-operator level:
  * logical node -> planner strategy -> physical exec, registered via
  * [[GraftExtensions]].
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] (left join; per
  * left row, payload of the right row with the greatest
  * `rightTime <= leftTime` on the same key; ties at equal time resolve
  * to the later right row in sort order).
  *
  * Physical shape: both children hash-clustered on the key (Spark's
  * EnsureRequirements inserts the exchanges and aligns partitioning)
  * and sorted by (key, time) — then a single per-partition two-pointer
  * merge. One shuffle per side + partition-local sort: the same cost
  * as a sort-merge join, with no window machinery.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    toleranceUs: Option[Long] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, pay, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    toleranceUs: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning =
    UnknownPartitioning(0)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = PhysicalDataType.ordering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val lKeyIdx = left.output.indexOf(leftKey)
    val lTimeIdx = left.output.indexOf(leftTime)
    val rKeyIdx = right.output.indexOf(rightKey)
    val rTimeIdx = right.output.indexOf(rightTime)
    val payIdx = payload.map(right.output.indexOf)
    val lKeyType = leftKey.dataType
    val lTimeType = leftTime.dataType
    val rOutput = right.output
    val payTypes = payload.map(_.dataType)

    val tol = toleranceUs

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullPayload = new GenericInternalRow(payload.size)
      val joiner = new JoinedRow
      val outProj = UnsafeProjection.create(output.map(_.dataType).toArray)

      var pending: InternalRow = null // right row read but not consumed
      var lastKey: Any = null
      var lastPayload: InternalRow = null // copy of best right row's payload
      var lastTime: Any = null // time of the matched right row (tolerance)

      def rightKeyOf(r: InternalRow): Any = r.get(rKeyIdx, lKeyType)
      def rightTimeOf(r: InternalRow): Any = r.get(rTimeIdx, lTimeType)

      // Sort iterators reuse row buffers (UnsafeRow / spill readers), so
      // any value held across iterator steps must own its bytes — else
      // a held UTF8String/byte[] silently re-points at the current row.
      def ownedCopy(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case b: Array[Byte] => b.clone()
        case d: org.apache.spark.sql.types.Decimal =>
          org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal, d.precision, d.scale)
        case x => x
      }

      def payloadOf(r: InternalRow): InternalRow = {
        val g = new GenericInternalRow(payload.size)
        payIdx.zipWithIndex.foreach { case (src, dst) =>
          g.update(dst, r.get(src, payTypes(dst)))
        }
        g
      }

      def withinTolerance(lt: Any): Boolean = tol match {
        case None => true
        case Some(t) =>
          lastTime != null &&
            lt.asInstanceOf[java.lang.Number].longValue -
              lastTime.asInstanceOf[java.lang.Number].longValue <= t
      }

      lIt.map { lRow =>
        val lk = lRow.get(lKeyIdx, lKeyType)
        val lt = lRow.get(lTimeIdx, lTimeType)
        if (lk == null || lt == null) {
          // Null key never matches; null time has nothing <= it (the
          // union/window form degrades identically to a null payload).
          outProj(joiner(lRow, nullPayload))
        } else {
          if (lastKey == null || keyOrd.compare(lastKey, lk) != 0) {
            lastKey = ownedCopy(lk); lastPayload = null; lastTime = null
          }
          // Advance right while its (key, time) <= (lk, lt).
          var advancing = true
          while (advancing) {
            if (pending == null && rIt.hasNext) pending = rIt.next()
            if (pending == null) advancing = false
            else {
              val rk = rightKeyOf(pending)
              val rt = rightTimeOf(pending)
              val cmpK = if (rk == null) -1 else keyOrd.compare(rk, lk)
              if (cmpK < 0) pending = null // behind: discard, keep advancing
              else if (cmpK == 0 && rt != null && timeOrd.compare(rt, lt) <= 0) {
                val owned = pending.copy()
                lastKey = ownedCopy(lk)
                lastPayload = payloadOf(owned)
                lastTime = ownedCopy(rightTimeOf(owned))
                pending = null
              } else if (cmpK == 0 && rt == null) {
                pending = null // null right time matches nothing; skip
              } else advancing = false // ahead of this left row: hold
            }
          }
          val emit =
            if (lastPayload != null && withinTolerance(lt)) lastPayload
            else nullPayload
          outProj(joiner(lRow, emit))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
