package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, GenericInternalRow, JoinedRow, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator top-k-per-group, the one operator in the suite where
  * the composed-built-ins plan is structurally wasteful: the
  * `row_number().over(window) ... WHERE rank <= k` formulation must
  * SORT every partition in full (O(n log n), spill-prone) to rank rows
  * it then throws away. This operator keeps a bounded heap of k rows
  * per group — O(n log k) time, O(groups x k) memory, no sort, no
  * spill — the same reason databases implement TopNPerGroup natively.
  *
  * Pieces: a logical node carrying plain column names (always resolved,
  * so the analyzer passes it through) → a planner strategy that binds
  * the names against the child's output → a physical exec that declares
  * `ClusteredDistribution(groupCols)` so Spark inserts the single
  * hash-partition exchange; each task then streams its partition once.
  *
  * `sortSpec` is (columnName, descending); nulls sort last under
  * descending and first under ascending, matching `Column.desc/asc`.
  */
case class TopKPerGroup(
    child: LogicalPlan,
    groupNames: Seq[String],
    sortSpec: Seq[(String, Boolean)],
    k: Int,
    rankAttr: AttributeReference)
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  /** Every child column flows through to the output (plus the group and
    * sort columns are consumed by name), so column pruning must not
    * drop anything below this node. */
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  private def bind(name: String, child: SparkPlan): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"TopKPerGroup: column '$name' not in ${child.output.map(_.name)}"))

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(child, groupNames, sortSpec, k, rankAttr) =>
      val planned = planLater(child)
      val groupAttrs = groupNames.map(bind(_, planned))
      val sortOrder = sortSpec.map { case (name, desc) =>
        if (desc) SortOrder(bind(name, planned), Descending, NullsLast, Seq.empty)
        else SortOrder(bind(name, planned), Ascending, NullsFirst, Seq.empty)
      }
      TopKPerGroupExec(groupAttrs, sortOrder, k, rankAttr, planned) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupAttrs: Seq[Attribute],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  /** All rows of a group on one partition; no ordering requirement —
    * the whole point is to avoid the sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupAttrs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupAttrsB = groupAttrs
    val sortOrderB = sortOrder
    val kB = k
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupAttrsB, childOutput)
      // ordering: "better" rows compare less (rank 1 = first in sortOrder)
      val ord = GenerateOrdering.generate(sortOrderB, childOutput)
      // Scala's PriorityQueue is a MAX-heap: with `ord` itself, head is
      // the worst kept row — the eviction candidate
      val heapOrd: Ordering[InternalRow] = ord
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kB) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val rows: Seq[InternalRow] = heap.dequeueAll.reverse
        rows.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopK {
  /** Top `k` rows per group, ranked by `sortSpec` = (column,
    * descending) — the custom-operator counterpart of
    * `row_number().over(Window...)` + filter. Appends `rankName`
    * (1-based). Columns must be plain references; pre-project computed
    * sort keys. Registers the planner strategy on the session's
    * experimental strategies (idempotent). */
  def topKPerGroup(df: DataFrame, groupNames: Seq[String],
      sortSpec: Seq[(String, Boolean)], k: Int,
      rankName: String = "rank_in_group"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftBridge.ofRows(spark,
      TopKPerGroup(df.queryExecution.analyzed, groupNames, sortSpec, k, rankAttr))
  }
}
