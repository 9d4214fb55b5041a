package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan for the BACKWARD as-of join — the
  * operator Spark lacks natively, here as the (c)-tier extension the
  * engine reserves for semantics composition can't express CHEAPLY:
  * a logical node + planner strategy + physical merge operator,
  * registered through `experimental.extraStrategies` /
  * SparkSessionExtensions.
  *
  * Semantics (identical to operators/Joins.AsofJoin "backward", which
  * remains the spelling for forward/tolerance variants): for every
  * left row, the right row with the LATEST right-time <= left-time
  * among equal join keys; left-outer, right rows with NULL key or
  * time never match, left rows with NULL key or time match nothing.
  *
  * Physical shape: children co-partitioned on the keys
  * (ClusteredDistribution pair, same as a shuffled join) and sorted
  * (keys..., time) — then ONE STREAMING MERGE PASS per partition
  * holding exactly one candidate row of state. No union of padded
  * schemas, no window buffer, no struct boxing: the window spelling
  * materializes L+R rows through a window frame; this touches each
  * input row once.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition like a shuffled equi-join (EnsureRequirements pairs
  // the two ClusteredDistributions into compatible hash partitionings)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition order (keys..., time) is what makes one merge pass
  // with O(1) state correct
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = BindReferences.bindReference(leftTime, left.output)
    val rTimeExpr = BindReferences.bindReference(rightTime, right.output)
    val lOut = left.output
    val rOut = right.output
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTime = lTimeExpr
      val rTime = rTimeExpr
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering =
        TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]
      // bind against NULLABLE right-side attrs: the outer-join null row
      // must be read through null checks, not as primitive defaults
      val resultProj = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val rightNulls = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // one-candidate merge state: the latest matching right row for
      // the key currently being scanned
      var rCur: InternalRow = null       // next unconsumed right row
      var matchRow: InternalRow = null   // copied candidate
      var matchKey: UnsafeRow = null     // copied candidate key
      def nextRight(): InternalRow = {
        while (rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          if (!k.anyNull && rTime.eval(r) != null) return r
        }
        null
      }

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lt = lTime.eval(l)
        if (lKey.anyNull || lt == null) {
          resultProj(joined(l, rightNulls))
        } else {
          // advance the right side up to (key, time]
          var advancing = true
          while (advancing) {
            if (rCur == null) rCur = nextRight()
            if (rCur == null) advancing = false
            else {
              val rKey = rKeyProj(rCur)
              val c = keyOrdering.compare(rKey, lKey)
              if (c < 0) rCur = null // smaller key: discard, keep going
              else if (c == 0 &&
                  timeOrdering.compare(rTime.eval(rCur), lt) <= 0) {
                matchRow = rCur.copy() // candidate; later ones overwrite
                matchKey = rKey.copy()
                rCur = null
              } else advancing = false // right is past this left row
            }
          }
          val ok = matchRow != null && keyOrdering.compare(matchKey, lKey) == 0
          resultProj(joined(l, if (ok) matchRow else rightNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
