package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a first-class operator (SURVEY §2B E12; the custom
  * LogicalPlan → Strategy → SparkPlan tier, like [[TopKPerGroupNode]]).
  *
  * Semantics: for each left row, attach the latest right row with
  * `right.ts <= left.ts` (inclusive) within the same key, optionally
  * bounded by a lookback tolerance — DuckDB `ASOF JOIN` / pandas
  * `merge_asof`. Every left row is emitted exactly once; carried columns
  * are null when no (in-tolerance) prior right row exists, and all carried
  * values come from the single matched right row.
  *
  * Physical shape: both sides hash-cluster by key and sort within
  * partitions by (key, ts) — right also by the carry columns so the
  * winner among equal-ts right rows is deterministic — then one streaming
  * merge pass per partition with O(1) state (the current match). Compared
  * to the union+window formulation ([[graft.operators.AsOfJoin.windowed]])
  * this shuffles two narrow sides instead of one null-padded union, never
  * buffers a window partition, and — because it is a real logical node —
  * the [[PushFilterThroughAsOfJoin]] rule lets key/left-only predicates
  * keep flowing into the parquet scans.
  *
  * Self-joins of the same plan lineage are not deduplicated (both sides
  * would share expr-ids); pass independently-loaded DataFrames.
  *
  * @param carryOutput stable output attributes (`asof_<col>`, nullable)
  *                    for the carried columns — held in the node so
  *                    expr-ids survive plan transformations
  */
case class AsOfJoinNode(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    carry: Seq[Attribute], carryOutput: Seq[Attribute],
    toleranceMicros: Option[Long],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carryOutput
  override def producedAttributes: AttributeSet = AttributeSet(carryOutput)
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    carry: Seq[Attribute], carryOutput: Seq[Attribute],
    toleranceMicros: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryOutput

  override def producedAttributes: AttributeSet = AttributeSet(carryOutput)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // right orders by carry after ts: among several right rows at the same
  // (key, ts) the LAST (max carry tuple) wins, deterministically — the
  // same tie-break the windowed formulation uses
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(k => SortOrder(k, Ascending)) :+
      SortOrder(leftTs, Ascending),
    rightKeys.map(k => SortOrder(k, Ascending)) ++
      (SortOrder(rightTs, Ascending) +:
        carry.map(c => SortOrder(c, Ascending))))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs
    val carryExprs = carry
    val tol = toleranceMicros
    val nCarry = carry.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nKeys = lKeys.size
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val carryProj = UnsafeProjection.create(carryExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lTs.dataType))
      val nullCarry: InternalRow = new GenericInternalRow(nCarry)
      val joined = new JoinedRow
      // downstream operators expect UnsafeRow; flatten the JoinedRow
      val resultProj = UnsafeProjection.create(
        (lOut ++ carryExprs).map(_.dataType).toArray)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = _
        private var rAvail = rIter.hasNext
        if (rAvail) rCur = rIter.next()
        // O(1) merge state: the latest in-key right row seen so far
        private var matchKey: UnsafeRow = _
        private var matchTs: UnsafeRow = _
        private var matchCarry: UnsafeRow = _

        private def advanceFor(lKeyR: UnsafeRow, lTsR: UnsafeRow): Unit = {
          var go = rAvail
          while (go) {
            val rKeyR = rKeyProj(rCur)
            // the natural ordering sorts nulls first, matching the sort
            // the children were asked for, so the merge stays monotone
            // even with null key fields; rows with a null key field can
            // never compare equal to the (all-non-null) probe key
            val cmp = keyOrd.compare(rKeyR, lKeyR)
            if (cmp < 0) { step() } // behind the probe key: discard
            else if (cmp == 0) {
              val rTsR = rTsProj(rCur)
              if (rTsR.isNullAt(0)) step() // null ts never matches
              else if (tsOrd.compare(rTsR, lTsR) <= 0) {
                matchKey = rKeyR.copy()
                matchTs = rTsR.copy()
                matchCarry = carryProj(rCur).copy()
                step()
              } else go = false // future right row: stop, keep for later
            } else go = false // right is ahead of this key
            go = go && rAvail
          }
        }

        private def step(): Unit = {
          rAvail = rIter.hasNext
          if (rAvail) rCur = rIter.next() else rCur = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKeyR = lKeyProj(lRow)
          val lTsR = lTsProj(lRow)
          var anyNullKey = lTsR.isNullAt(0)
          var ki = 0
          while (!anyNullKey && ki < nKeys) {
            anyNullKey = lKeyR.isNullAt(ki); ki += 1
          }
          if (anyNullKey)
            // null key/ts: no match possible
            return resultProj(joined(lRow, nullCarry))
          advanceFor(lKeyR.copy(), lTsR)
          val matched = matchKey != null &&
            keyOrd.compare(matchKey, lKeyR) == 0 &&
            (tol match {
              case Some(t) => matchTs.getLong(0) >= lTsR.getLong(0) - t
              case None => true
            })
          if (matched) resultProj(joined(lRow, matchCarry))
          else resultProj(joined(lRow, nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): SparkPlan = copy(left = l, right = r)
}

/** Optimizer rule: as-of join emits every left row exactly once, so a
  * deterministic predicate over left-side columns commutes with the
  * operator and pushes into the left child; a conjunct referencing ONLY
  * the join key additionally prunes the right side (a right row whose key
  * is filtered out can never be carried). Catalyst cannot know either
  * about a foreign node — without this rule any filter above an as-of
  * join blocks parquet pushdown. */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, aj: AsOfJoinNode) if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, rest) = conjuncts.partition(
        _.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keySet = AttributeSet(aj.leftKeys)
        val l2r = aj.leftKeys.zip(aj.rightKeys).toMap
        val keyOnly = leftOnly.filter(
          c => c.references.nonEmpty && c.references.subsetOf(keySet))
        val newRight =
          if (keyOnly.isEmpty) aj.right
          else Filter(keyOnly.map(_.transform {
            case a: Attribute if l2r.keys.exists(_.semanticEquals(a)) =>
              l2r.find(_._1.semanticEquals(a)).get._2
          }).reduce(org.apache.spark.sql.catalyst.expressions.And),
            aj.right)
        val pushed = aj.copy(
          left = Filter(leftOnly.reduce(
            org.apache.spark.sql.catalyst.expressions.And), aj.left),
          right = newRight)
        if (rest.isEmpty) pushed
        else Filter(rest.reduce(
          org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }
}

/** Planner strategy for [[AsOfJoinNode]]. */
object AsOfJoinStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lts, rts, carry, carryOut, tol, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, carry, carryOut, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
