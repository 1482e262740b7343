package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftInternal}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §2 custom-operator path (c)):
  * per-group top-k as a first-class plan node.
  *
  * Two stages: a partial stage keeps a bounded k-heap per group per
  * input partition (map-side reduction), the final stage (clustered on
  * the group keys) merges heaps. Spark 4's own `WindowGroupLimit
  * Partial` achieves the same shuffle pruning for the
  * `row_number().over(w) <= k` pattern (verified by shuffle-bytes
  * measurement in tools/MicroBench) — the remaining win here is
  * algorithmic: heaps are O(n·log k) where WindowGroupLimit full-sorts
  * each partition twice (O(n·log n)); measured ~1.2× on 20M rows /
  * 100k groups, growing with partition size.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression],
                            sortOrders: Seq[SortOrder], k: Int,
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            sortOrders: Seq[SortOrder], k: Int,
                            partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupEs = groupExprs
    val orders = sortOrders
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupEs, childOutput)
      // "first in sort order" = smallest under this comparator; the heap
      // dequeues the LARGEST (worst) element, which we evict beyond k
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(orders, childOutput)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) => out ++= heap.dequeueAll.reverseIterator }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, so, k, child) =>
      val partialExec = TopKPerGroupExec(g, so, k, partial = true, planLater(child))
      TopKPerGroupExec(g, so, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Per-group top-k of `df`: first `k` rows of each group under
    * `sortCols` (`(name, descending?)`; include a unique tiebreak for
    * determinism). Registers the planner strategy on the session's
    * experimental methods (idempotent). Expressions are built from the
    * names directly (fresh UnresolvedAttributes, resolved by the
    * Analyzer against the child) — Column→Expression conversion would
    * tag them with non-serializable ColumnNode internals that break
    * task closure serialization. */
  def apply(df: DataFrame, groupCols: Seq[String],
            sortCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val orders = sortCols.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (desc) Descending else Ascending)
    }
    GraftInternal.ofRows(spark, TopKPerGroupPlan(
      groupCols.map(UnresolvedAttribute.quoted), orders, k,
      GraftInternal.logicalPlan(df)))
  }
}
