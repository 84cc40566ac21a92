package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per group as a first-class operator — the (c) rung of the
  * custom-operator ladder: LogicalPlan node + Strategy + SparkPlan,
  * registered per session (no SparkSessionExtensions needed since we
  * inject an already-resolved plan).
  *
  * Why: the composed-builtin form (`row_number().over(Window...) <= k`)
  * must SORT every group completely — at 100 TB that is a full
  * sort-within-partitions of the whole fact table to keep k rows per
  * group. This operator clusters by the group keys (one shuffle, same
  * as the window) but then keeps a bounded k-element binary heap per
  * group: O(n log k) with O(groups·k) memory, no sort buffer, no spill
  * pressure. Emits each group's rows in rank order with a `rank` column
  * appended, so results are byte-identical to the window form (given a
  * total, deterministic ordering) — q28 verifies exactly that against
  * the DuckDB oracle.
  */
case class TopKPerGroup(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // constructor parameter (not a body val): plan transforms copy() the
    // node, and a body-initialized attribute would mint a fresh exprId
    // each time, orphaning downstream references to `rank`
    rankAttr: AttributeReference =
      AttributeReference("rank", IntegerType, nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Map-side partial top-k: the same bounded-heap pass run BEFORE the
  * clustering exchange, so at most `k` rows per (group, input partition)
  * are shuffled instead of every row. Correct because top-k is
  * decomposable: topK(∪ parts) = topK(∪ topK(part)). This is the
  * aggregate-style partial/final split for an operator the window form
  * cannot split at all — with G groups and P map partitions the exchange
  * carries ≤ G·P·k rows, independent of input size; the skew a
  * Q-cardinality grouping key creates on the reduce side is bounded the
  * same way (each reducer receives ≤ P·k rows per group, not n).
  */
case class TopKPartialExec(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupByLocal = groupBy
    val orderLocal = order
    val kLocal = k
    val schema = child.output
    child.execute().mapPartitions({ rows =>
      TopKPerGroup.heapsPerPartition(rows, groupByLocal, orderLocal, schema, kLocal)
        .flatMap(_._2)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  // One shuffle clustering each group into one partition — the same
  // exchange the window form needs, but no child ordering requirement
  // (that's the point: no sort).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupBy) :: Nil

  // the operator is partition-local, so the clustering it required
  // stays visible downstream (a later groupBy/join on the same keys
  // must not re-shuffle)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression trees; generated projections
    // and orderings are built per partition on the executor
    val groupByLocal = groupBy
    val orderLocal = order
    val kLocal = k
    val schema = child.output
    val rankAttrLocal = rankAttr
    val fn = (rows: Iterator[InternalRow]) => {
      val joiner = UnsafeProjection.create(schema :+ rankAttrLocal, schema :+ rankAttrLocal)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      TopKPerGroup.heapsPerPartition(rows, groupByLocal, orderLocal, schema, kLocal)
        .flatMap { case (_, ranked) =>
          ranked.iterator.zipWithIndex.map { case (r, idx) =>
            rankRow.setInt(0, idx + 1)
            joiner(joined(r, rankRow))
          }
        }
    }
    child.execute().mapPartitions(fn, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** The shared bounded-heap pass: consume one partition, return per
    * group the best `k` rows in rank order. Heap root is the WORST
    * retained row (reverse ordering) so a better incoming row replaces
    * it in O(log k); total cost O(n log k), memory O(groups·k).
    */
  private[plans] def heapsPerPartition(
      rows: Iterator[InternalRow],
      groupByLocal: Seq[Expression],
      orderLocal: Seq[SortOrder],
      schema: Seq[Attribute],
      kLocal: Int): Iterator[(InternalRow, Array[InternalRow])] = {
    val groupProj = UnsafeProjection.create(groupByLocal, schema)
    val ordering = GenerateOrdering.generate(orderLocal, schema)
    val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
    val reverse = ordering.reverse
    while (rows.hasNext) {
      val row = rows.next()
      val key = groupProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        // initial capacity only — the heap grows as needed, so cap it:
        // kLocal + 1 overflows to negative (an IllegalArgumentException)
        // for k near Int.MaxValue, the "effectively unbounded" setting
        // callers use to mean keep-everything
        heap = new java.util.PriorityQueue[InternalRow](
          math.min(kLocal, 1024) + 1, reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < kLocal) heap.add(row.copy())
      else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.map { e =>
      val heap = e.getValue
      val arr = new Array[InternalRow](heap.size)
      var i = heap.size - 1
      while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // heap pops worst-first
      e.getKey -> arr
    }
  }

  /** Strategy planning the logical node: a map-side partial top-k below
    * the clustering exchange (inserted by EnsureRequirements against the
    * final's required distribution), then the final ranked top-k.
    * Registered idempotently per session on first use
    * (spark.experimental.extraStrategies — the public per-session
    * registration point; SparkSessionExtensions would be the equivalent
    * for builder-time registration).
    */
  object Strategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroup(g, o, k, child, rankAttr) =>
        TopKPerGroupExec(g, o, k, rankAttr,
          TopKPartialExec(g, o, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Sort direction for [[topK]]'s order spec. */
  sealed trait Dir
  case object Asc extends Dir
  case object Desc extends Dir

  /** API surface: top `k` rows per `groupCols` by `orderSpec`
    * (column name → direction; must form a total order for
    * deterministic results), with a 1-based `rank` column appended.
    * Attributes resolve directly against the input's analyzed plan, so
    * the injected node is fully resolved on construction.
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderSpec: Seq[(String, Dir)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "at least one group column is required")
    require(orderSpec.nonEmpty, "an order specification is required")
    val spark = df.sparkSession
    graft.plans.Strategies.register(spark, Strategy)
    val child = GraftSqlBridge.analyzedPlan(df)
    // exact match first, then unique case-insensitive match (Spark's
    // default resolver is case-insensitive); ambiguity is an error
    def attr(n: String): Attribute =
      child.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => child.output.filter(_.name.equalsIgnoreCase(n)) match {
          case Seq(a) => a
          case Seq() => throw new IllegalArgumentException(
            s"no column $n in ${child.output.map(_.name).mkString(", ")}")
          case many => throw new IllegalArgumentException(
            s"ambiguous column $n: ${many.map(_.name).mkString(", ")}")
        }
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} columns share the name")
      }
    val sortOrders = orderSpec.map {
      case (n, Asc) => SortOrder(attr(n), Ascending)
      case (n, Desc) => SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), sortOrders, k, child))
  }
}
