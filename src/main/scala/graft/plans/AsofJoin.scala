package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The custom-operator tier of the extension layer: a native AS-OF JOIN
  * as a LogicalPlan node + SparkStrategy + SparkPlan, registered through
  * [[GraftExtensions]]. Semantics match [[graft.core.Temporal.asofJoin]]
  * exactly (ASOF LEFT: every left row gets the payload of the latest
  * right row with `right.ts <= left.ts` on the same keys, or nulls):
  * AsofJoinSpec asserts row-for-row parity on randomized inputs.
  *
  * Physical shape: both children hash-cluster on the join keys and sort
  * within partitions by (keys, ts) — the same requirements SortMergeJoin
  * declares, satisfied by EnsureRequirements with one Exchange per side —
  * then a single forward merge scan pairs each left row with the held
  * latest-prior right row. Versus the window-based composition this
  * skips the union and the window buffer: no row ever carries null
  * padding, and the scan holds ONE right row, not a frame.
  *
  * Right rows should be unique per (keys, ts) (pre-aggregate duplicates
  * away as Temporal.asofJoin documents); with duplicates the last in
  * sort order wins deterministically only if the sort is total. Null
  * timestamps: right rows with null ts never match; left rows with null
  * ts get null payloads.
  *
  * `direction` extends the scan to the full merge_asof surface with no
  * extra passes: the SAME forward merge keeps the latest-prior row
  * (backward candidate) while the unconsumed lookahead row IS the
  * earliest at-or-after row (forward candidate — a timestamp tie is
  * consumed into the held row and recognized by `heldTs == lTs`);
  * nearest picks the smaller integer-micros delta, exact ties backward.
  * `toleranceMicros` nulls the payload when the chosen match is farther
  * — matching [[graft.core.Temporal.asofJoinDirected]] bit-for-bit
  * (AsofJoinSpec asserts randomized parity for every direction).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    direction: String = "backward",
    toleranceMicros: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut attrs are produced HERE (fresh exprIds), not consumed —
  // without this, CheckAnalysis counts them as missing input
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {
  /** Build with fresh, nullable output attributes for the payload
    * (unmatched left rows carry nulls).
    */
  val Directions: Set[String] = Set("backward", "forward", "nearest")

  def resolved(left: LogicalPlan, right: LogicalPlan,
               leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
               leftTs: Attribute, rightTs: Attribute,
               payload: Seq[Attribute],
               direction: String = "backward",
               toleranceMicros: Option[Long] = None): AsofJoinPlan = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    Seq(leftTs, rightTs).foreach(a => require(
      a.dataType == TimestampType || a.dataType == LongType,
      s"as-of ts column ${a.name} must be timestamp or long, got ${a.dataType}"))
    // the merge scan compares raw longs and UnsafeRow key bytes — a
    // type mismatch between the sides would not error, it would
    // silently mis-pair rows (micros vs seconds, int vs long key
    // layouts), so fail loudly at build time instead
    require(leftTs.dataType == rightTs.dataType,
      s"as-of ts columns must have the SAME type on both sides, got " +
        s"${leftTs.name}: ${leftTs.dataType} vs ${rightTs.name}: ${rightTs.dataType}")
    require(leftKeys.nonEmpty,
      "as-of join needs at least one key column (ClusteredDistribution " +
        "can't be empty); for a global as-of join use Temporal.asofJoin's " +
        "window composition or add a constant key to both sides")
    require(leftKeys.length == rightKeys.length,
      s"key count mismatch: ${leftKeys.map(_.name)} vs ${rightKeys.map(_.name)}")
    leftKeys.zip(rightKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key type mismatch: ${l.name}: ${l.dataType} vs " +
          s"${r.name}: ${r.dataType} — the key ordering is built from the " +
          s"left types and would read the right side's bytes wrong")
    }
    require(Directions.contains(direction), s"unknown direction: $direction")
    require(toleranceMicros.forall(_ >= 0), "tolerance must be non-negative")
    AsofJoinPlan(left, right, leftKeys, rightKeys, leftTs, rightTs, payload,
      payload.map(a => a.withNullability(true).newInstance()),
      direction, toleranceMicros)
  }
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.payload, p.payloadOut, planLater(p.left), planLater(p.right),
        p.direction, p.toleranceMicros) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan,
    direction: String = "backward",
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lTsOrdinal = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsOrdinal = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyTypes = leftKeys.map(_.dataType)
    val lKeysLocal = leftKeys
    val rKeysLocal = rightKeys
    val payloadLocal = payload
    val rWidth = rOut.size
    // 0 = backward, 1 = forward, 2 = nearest — resolved once, not per row
    val dir = direction match {
      case "backward" => 0
      case "forward" => 1
      case _ => 2
    }
    val tol = toleranceMicros.getOrElse(Long.MaxValue)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysLocal, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysLocal, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // right-side input schema forced nullable: BindReferences takes
      // nullability from the INPUT attribute, and the bound reader must
      // null-check even non-nullable source columns because unmatched
      // left rows read from the all-null pad row
      val outProj = UnsafeProjection.create(
        lOut ++ payloadLocal, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row + its key (both copies: UnsafeProjection
        // and the child iterator reuse their buffers)
        private var nextR: InternalRow = _
        private var nextRKey: UnsafeRow = _
        private var nextRTsNull = false
        private var nextRTs = 0L
        advanceRight()
        // held = latest right row with ts <= current left ts, same key
        private var held: InternalRow = _
        private var heldKey: UnsafeRow = _
        private var heldTs = 0L

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            nextR = r.copy()
            nextRKey = rKeyProj(r).copy()
            nextRTsNull = nextR.isNullAt(rTsOrdinal)
            nextRTs = if (nextRTsNull) 0L else nextR.getLong(rTsOrdinal)
          } else { nextR = null; nextRKey = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsNull = lRow.isNullAt(lTsOrdinal)
          val lTs = if (lTsNull) 0L else lRow.getLong(lTsOrdinal)
          // a held row from an earlier key group never matches again
          if (held != null && keyOrd.compare(heldKey, lKey) != 0) held = null
          // consume right rows that are behind or at this left position:
          // smaller keys are permanently done (left is key-sorted);
          // equal-key rows with ts <= lTs become the held match
          var continue = nextR != null
          while (continue) {
            val kc = keyOrd.compare(nextRKey, lKey)
            // null-ts right rows sort first (nulls-first ascending) and
            // can never match — discard so they don't stall the scan
            if (kc < 0 || (kc == 0 && nextRTsNull)) advanceRight()
            else if (kc == 0 && !lTsNull && nextRTs <= lTs) {
              held = nextR; heldKey = nextRKey; heldTs = nextRTs
              advanceRight()
            } else continue = false
            if (nextR == null) continue = false
          }
          // candidates: backward = the held row (ties at lTs included —
          // the <= consume above just took them); forward = the tied
          // held row if any, else the unconsumed nextR on the same key
          // (right ascending ⇒ it IS the earliest row with ts > lTs)
          // deltas saturate instead of wrapping: the true difference is
          // non-negative by construction (heldTs <= lTs < nextRTs), so
          // a negative raw subtraction means Long overflow (reachable
          // only for LongType ts columns with extreme values) — wrapped
          // it would defeat the tolerance gate and flip nearest's pick
          val backOk = held != null && !lTsNull
          val backDelta =
            if (backOk) { val d = lTs - heldTs; if (d < 0L) Long.MaxValue else d }
            else Long.MaxValue
          val fwdTie = backOk && heldTs == lTs
          val fwdNext = !lTsNull && nextR != null &&
            keyOrd.compare(nextRKey, lKey) == 0
          val fwdRow: InternalRow =
            if (fwdTie) held else if (fwdNext) nextR else null
          val fwdDelta =
            if (fwdTie) 0L
            else if (fwdNext) { val d = nextRTs - lTs; if (d < 0L) Long.MaxValue else d }
            else Long.MaxValue
          val (row, delta) = dir match {
            case 0 => (if (backOk) held else null, backDelta)
            case 1 => (fwdRow, fwdDelta)
            case _ => // nearest: exact ties go backward
              if (fwdRow == null || (backOk && backDelta <= fwdDelta))
                (if (backOk) held else null, backDelta)
              else (fwdRow, fwdDelta)
          }
          val matched = row != null && delta <= tol
          outProj(joined(lRow, if (matched) row else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
