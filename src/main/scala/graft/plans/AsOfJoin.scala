package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Match direction for the as-of join. */
sealed trait AsOfDirection
object AsOfDirection {
  /** Latest right row with rightTime ≤ leftTime (the classic as-of). */
  case object Backward extends AsOfDirection
  /** Earliest right row with rightTime ≥ leftTime. */
  case object Forward extends AsOfDirection
  /** Right row minimizing |rightTime − leftTime|; ties break backward. */
  case object Nearest extends AsOfDirection

  def parse(s: String): AsOfDirection = s.toLowerCase(java.util.Locale.ROOT) match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be backward|forward|nearest, got '$other'")
  }
}

/** A whole-operator extension (SURVEY.md §7.3 "as-of join … candidate for a
  * custom SparkStrategy"): for every left row, attach the right row in the
  * same key that is adjacent in time — the latest at-or-before
  * ([[AsOfDirection.Backward]]), earliest at-or-after
  * ([[AsOfDirection.Forward]]), or closest either way
  * ([[AsOfDirection.Nearest]]) — optionally within an absolute `tolerance`
  * of the left row's time. The canonical event-enrichment join Spark lacks
  * as a first-class operator.
  *
  * Logical node → [[AsOfJoinStrategy]] → [[AsOfJoinExec]]. The physical
  * operator demands hash-clustered children sorted by (key, time), so
  * EnsureRequirements plans exactly one shuffle per side (same as a
  * sort-merge join), and the merge itself is a streaming two-pointer pass —
  * one retained backward candidate plus a peek at the buffered head for the
  * forward candidate, O(left + right) per partition, no time-range blowup
  * like the naive `left JOIN right ON key AND r.time <= l.time` +
  * re-aggregation.
  *
  * Types: keys may be ANY orderable type (compared with the interpreted
  * ordering, equal types both sides); times may be any integral-backed type
  * — long/int/short/byte, date (days) or timestamp (µs) — compared and
  * differenced on the internal integral value, so timestamps keep full
  * microsecond precision (a `CAST(ts AS LONG)` would truncate to seconds).
  *
  * Duplicate right timestamps: backward keeps the LAST right row with
  * rt ≤ lt and forward the FIRST with rt ≥ lt — first/last in the
  * operator's (key, time)-sort OUTPUT order, which is not stable w.r.t.
  * right-side input order. That matches pandas `merge_asof` only when the
  * selected payload is tie-invariant (equal-time right rows carry equal
  * payloads, e.g. the matched time itself — as in the shipped queries);
  * with distinct payloads on equal timestamps the choice is deterministic
  * within a plan but may vary across partitionings. Nearest at distance 0
  * behaves like backward (last equal-time row); at a strict distance tie
  * (|back| == |fwd| > 0) it takes the earlier (backward) row.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        direction: AsOfDirection = AsOfDirection.Backward,
                        tolerance: Option[Long] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        direction: AsOfDirection = AsOfDirection.Backward,
                        tolerance: Option[Long] = None)
    extends BinaryExecNode {

  private def integralBacked(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  require(RowOrdering.isOrderable(leftKey.dataType),
    s"as-of join key type ${leftKey.dataType} is not orderable")
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(integralBacked(leftTime.dataType) && integralBacked(rightTime.dataType),
    s"as-of join time must be an integral-backed type (long/int/date/timestamp), " +
      s"got ${leftTime.dataType} / ${rightTime.dataType}")
  require(tolerance.forall(_ >= 0L), "as-of tolerance must be non-negative")

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
    val dir = direction
    val tol = tolerance
    val keyType = leftKey.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
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
      // dates and timestamps are Int/Long internally — compare and
      // difference the integral value, full precision, no Cast
      def toLong(v: Any): Long = v.asInstanceOf[Number].longValue
      def within(delta: Long): Boolean = tol.forall(delta <= _)

      var matchKey: Any = null    // key of the retained backward candidate
      var matchTime: Long = 0L
      var matchRow: InternalRow = null // .copy()'d — sort output rows are reused
      // FIRST right row of the most recent consumed (key, time) run — the
      // forward candidate when rt == lt. pandas merge_asof forward parity:
      // among equal-time right rows, forward matches the FIRST, while
      // backward (and the backward candidate above) keeps the LAST.
      var eqKey: Any = null
      var eqTime: Long = 0L
      var eqRow: InternalRow = null

      lIter.map { lRow =>
        val keyV = boundLk.eval(lRow)
        val timeV = boundLt.eval(lRow)
        if (keyV == null || timeV == null) {
          // null key/time never matches (SQL equi-join semantics) — emit
          // the left row with an all-null right side instead of unboxing
          // null to 0 and silently matching key 0
          resultProj(joined(lRow, nullRight))
        } else {
          val time = toLong(timeV)
          // advance the right side past every row strictly before the
          // current (key, time) frontier, retaining the last same-key row
          // with rTime ≤ time as the backward candidate; afterwards the
          // buffered head (if same key) is the forward candidate. Left rows
          // arrive key/time-ascending, so dropped rows are never needed by
          // a later left row.
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
              val cmp = keyOrd.compare(hKeyV, keyV)
              val hTime = toLong(hTimeV)
              if (cmp < 0 || (cmp == 0 && hTime <= time)) {
                val r = rBuffered.next()
                if (cmp == 0) {
                  matchKey = hKeyV; matchTime = hTime; matchRow = r.copy()
                  // first row of a new (key, time) run → forward-tie candidate
                  if (eqRow == null || eqTime != hTime ||
                      keyOrd.compare(eqKey, hKeyV) != 0) {
                    eqKey = hKeyV; eqTime = hTime; eqRow = matchRow
                  }
                }
                continue = rBuffered.hasNext
              } else {
                continue = false
              }
            }
          }
          val backOk = matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, keyV) == 0 && within(time - matchTime)
          // forward candidate: first remaining right row, if it shares the key
          var fwdRow: InternalRow = null
          var fwdDelta = Long.MaxValue
          if (dir != AsOfDirection.Backward && rBuffered.hasNext) {
            val head = rBuffered.head
            val hKeyV = boundRk.eval(head)
            val hTimeV = boundRt.eval(head)
            if (hKeyV != null && hTimeV != null && keyOrd.compare(hKeyV, keyV) == 0) {
              val d = toLong(hTimeV) - time
              if (within(d)) { fwdRow = head; fwdDelta = d }
            }
          }
          val rSide = dir match {
            case AsOfDirection.Backward => if (backOk) matchRow else nullRight
            case AsOfDirection.Forward  =>
              // rt == lt rows were consumed into the backward candidate by
              // the advance loop, but forward is INCLUSIVE of rt ≥ lt — and
              // among equal-time ties it matches the FIRST right row
              // (pandas merge_asof parity), which eqRow retains
              if (eqRow != null && eqTime == time &&
                  keyOrd.compare(eqKey, keyV) == 0) eqRow
              else if (fwdRow != null) fwdRow
              else nullRight
            case AsOfDirection.Nearest  =>
              // ties (equal distance) break backward — the earlier row
              if (backOk && (fwdRow == null || time - matchTime <= fwdDelta)) matchRow
              else if (fwdRow != null) fwdRow
              else nullRight
          }
          resultProj(joined(lRow, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
