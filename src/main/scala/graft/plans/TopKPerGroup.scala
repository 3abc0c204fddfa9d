package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k-per-group as a first-class operator (SURVEY §2B E22 at scale;
  * the custom LogicalPlan → Strategy → SparkPlan tier of the extension
  * preference list).
  *
  * The standard formulation — `row_number() OVER (PARTITION BY g ORDER BY
  * v) <= k` — SORTS every group in full before discarding all but k rows;
  * at 100 TB with large groups that is the dominant cost. This operator
  * never sorts a group: each task keeps a bounded k-row heap per group
  * (partial phase), the shuffle carries at most `k × groups` rows per
  * task, and the final phase merges heaps after clustering by group key.
  * The window formulation shuffles EVERY row; this shuffles ≤ k per group
  * per task — the same partial/final shape as HashAggregate.
  *
  * Ties are broken by the caller-supplied total ordering (`order` should
  * end with a unique column), so results are deterministic and
  * oracle-comparable.
  *
  * Memory bound: each task holds k rows per distinct group key it sees
  * (no spill path yet) — right for the usual "top-k per entity" shapes
  * where keys-per-task × k fits memory; for near-unique group keys prefer
  * the window formulation, which sorts externally.
  */
case class TopKPerGroupNode(groupCols: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupCols: Seq[Expression],
    order: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = groupCols
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(sortOrder, childOutput)
      // per-group bounded max-heap: evict the ordering-largest row once
      // the heap holds k, so it always contains the k ordering-smallest
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue
            .empty[InternalRow](rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.enqueue(row.copy())
        } else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      // emit each group's rows in rank order (dequeueAll is max-first)
      heaps.values().forEach(h => out ++= h.dequeueAll.reverseIterator)
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Optimizer rule: push a Filter through [[TopKPerGroupNode]] when its
  * predicate references only group columns. Legal because top-k is
  * computed independently per group — dropping whole groups before or
  * after the operator is equivalent — but Catalyst cannot know that about
  * a foreign node, so without this rule a group filter above top-k blocks
  * parquet pushdown entirely. */
object PushFilterThroughTopKPerGroup
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      // group keys must be bare attributes: for a computed key (a % 2),
      // a predicate on `a` is NOT constant within a group, so pushing it
      // below the top-k would change which rows win
      case f @ Filter(cond, topk @ TopKPerGroupNode(group, _, _, child))
          if cond.deterministic &&
            group.forall(_.isInstanceOf[Attribute]) &&
            f.condition.references.subsetOf(AttributeSet(group)) =>
        topk.copy(child = Filter(cond, child))
    }
}

/** Planner strategy: partial heaps per input partition, cluster by group,
  * final merge — EnsureRequirements inserts the exchange between the two
  * phases exactly like a two-phase aggregate. */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child) =>
      TopKPerGroupExec(group, order, k, partial = false,
        TopKPerGroupExec(group, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}
