package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** Whole-operator top-k per group (W1) as a custom logical node +
  * planner strategy + physical operator, registered through
  * SparkSessionExtensions (GraftExtensions injects [[GraftStrategies]]).
  *
  * Why a custom operator: the window formulation
  * (`row_number over (partition by g order by o) <= k`) SORTS every
  * group completely — O(n log n) per group plus a rank column — while
  * top-k only needs a k-bounded heap: O(n log k), no rank column, and
  * the heap state is k rows per group instead of the whole group
  * buffered for the sort. At 100 TB with millions of rows per group and
  * k in the tens, that is the difference between spilling sorts and a
  * streaming pass. The required child distribution is clustering on the
  * group keys, so Catalyst inserts exactly the same single shuffle the
  * window would need — the win is purely in what happens after it.
  *
  * Semantics match `Relational.topNPerGroup` (ties broken by the order
  * expressions supplied; supply a tie-break column for determinism) and
  * are oracle-verified against the same DuckDB SQL as the window form.
  */
case class TopKPerGroupNode(groupCols: Seq[Attribute], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupCols: Seq[Attribute], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** One hash-partition shuffle on the group keys — shared with (not
    * added to) whatever the window formulation would shuffle. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val grpExprs = groupCols
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions ({ iter =>
      val grpProj = UnsafeProjection.create(grpExprs, schema)
      val ordering = RowOrdering.create(sortOrder, schema)
      // PriorityQueue dequeues the LARGEST under `ordering` = the current
      // worst of the kept k — exactly the eviction candidate.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = grpProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](
              ordering.asInstanceOf[Ordering[InternalRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Public entry: top-k rows per group of `df`, ordered by the named
    * columns (`(name, ascending)`); resolution is by name against the
    * analyzed child plan, so the node is born resolved. */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"TopKPerGroup: no column '$name' in ${analyzed.output.map(_.name)}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, analyzed))
  }
}
