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
  * Memory bound: the partial phase flushes its heaps downstream whenever
  * a task has accumulated `maxGroupsInMemory` distinct groups (extra
  * partial rows are always re-merged by the final phase), so task memory
  * is bounded regardless of group cardinality; the final phase holds one
  * k-row heap per key of its own output partition.
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

  /** Memory guard for the partial phase: when a task has seen more than
    * this many distinct groups, flush current heaps downstream and reset.
    * Emitting extra partial rows is always correct (the final phase
    * re-merges per key); it trades shuffle volume for bounded memory on
    * high-cardinality group keys. The final phase never flushes — its
    * footprint is the operator's own output for the partition. */
  private def maxGroupsInMemory: Int =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.topk.maxGroupsInMemory", "262144").toInt

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = groupCols
    val sortOrder = order
    val kk = k
    val flushThreshold = if (partial) maxGroupsInMemory else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(sortOrder, childOutput)
      // per-group bounded max-heap: evict the ordering-largest row once
      // the heap holds k, so it always contains the k ordering-smallest
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()

      def drain(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
        // emit each group's rows in rank order (dequeueAll is max-first)
        heaps.values().forEach(h => out ++= h.dequeueAll.reverseIterator)
        heaps.clear()
        out.iterator
      }

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = groupProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size >= flushThreshold) pending = drain()
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
          if (!pending.hasNext && !iter.hasNext && !heaps.isEmpty) {
            pending = drain()
          }
        }
        override def hasNext: Boolean = { fill(); pending.hasNext }
        override def next(): InternalRow = { fill(); pending.next() }
      }
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
