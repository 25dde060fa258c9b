package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A whole-operator extension (SURVEY.md §7.3 "as-of join … candidate for a
  * custom SparkStrategy"): for every left row, attach the latest right row
  * whose time is ≤ the left row's time within the same key — the canonical
  * event-enrichment join Spark lacks as a first-class operator.
  *
  * Logical node → [[AsOfJoinStrategy]] → [[AsOfJoinExec]]. The physical
  * operator demands hash-clustered children sorted by (key, time), so
  * EnsureRequirements plans exactly one shuffle per side (same as a
  * sort-merge join), and the merge itself is a streaming two-pointer pass —
  * no buffering beyond one retained right row, O(left + right) per
  * partition, no time-range blowup like the naive
  * `left JOIN right ON key AND r.time <= l.time` + re-aggregation.
  *
  * v1 restriction (documented): key and time expressions must be LongType.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val boundLk = BindReferences.bindReference(lk, lOut)
      val boundLt = BindReferences.bindReference(lt, lOut)
      val boundRk = BindReferences.bindReference(rk, rOut)
      val boundRt = BindReferences.bindReference(rt, rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // project with the NULLABLE output attributes (right side may be the
      // all-null row) — binding the original non-nullable right attrs would
      // codegen away the null checks and read nulls as zeros.
      val resultProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val rBuffered = rIter.buffered

      var matchKey = Long.MinValue
      var matchRow: InternalRow = null // .copy()'d — sort output rows are reused

      lIter.map { lRow =>
        val keyV = boundLk.eval(lRow)
        val timeV = boundLt.eval(lRow)
        if (keyV == null || timeV == null) {
          // null key/time never matches (SQL equi-join semantics) — emit
          // the left row with an all-null right side instead of unboxing
          // null to 0L and silently matching key 0
          resultProj(joined(lRow, nullRight))
        } else {
          val key = keyV.asInstanceOf[Long]
          val time = timeV.asInstanceOf[Long]
          // advance the right side to the last row with (key, time') ≤ (key, time)
          var continue = rBuffered.hasNext
          while (continue) {
            val head = rBuffered.head
            val hKeyV = boundRk.eval(head)
            val hTimeV = boundRt.eval(head)
            if (hKeyV == null || hTimeV == null) {
              // unmatched by definition; nulls sort first, so skipping keeps
              // the two-pointer invariant
              rBuffered.next()
              continue = rBuffered.hasNext
            } else {
              val hKey = hKeyV.asInstanceOf[Long]
              val hTime = hTimeV.asInstanceOf[Long]
              if (hKey < key || (hKey == key && hTime <= time)) {
                val r = rBuffered.next()
                if (hKey == key) { matchKey = hKey; matchRow = r.copy() }
                continue = rBuffered.hasNext
              } else {
                continue = false
              }
            }
          }
          val rSide = if (matchRow != null && matchKey == key) matchRow else nullRight
          resultProj(joined(lRow, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
