package graft.plans

import java.util.{Comparator, PriorityQueue}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator custom plan: TOP-K PER GROUP with bounded heaps — the
  * full extension ladder (LogicalPlan -> Strategy -> SparkPlan), used where
  * composition genuinely leaves performance behind: the DataFrame
  * formulation (`row_number().over(partitionBy(g).orderBy(o)) <= k`) must
  * SORT every group completely; this operator keeps only a k-element heap
  * per group — O(n log k) CPU and O(groups x k) memory instead of an
  * O(n log n) in-partition sort, with identical results for a total
  * ordering.
  *
  * Physical contract: requires `ClusteredDistribution(groupExprs)` so
  * EnsureRequirements inserts exactly one hash exchange (the same shuffle
  * the window formulation pays) and the heaps run data-local. Output order
  * within a group is unspecified, like any aggregate.
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = ordering
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(orderLocal, childOutput)
      // heap head = WORST of the current best k -> evict when a better row
      // arrives; reversed comparator turns the "first under the ordering"
      // semantics into a max-heap of the kept set
      val heapCmp: Comparator[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(b, a)
      val heaps = new java.util.HashMap[UnsafeRow, PriorityQueue[UnsafeRow]]()
      while (rows.hasNext) {
        val row = rows.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new PriorityQueue[UnsafeRow](kLocal + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Default group-cardinality ceiling for the heap path: 4M groups x k
    * rows is comfortably in-memory on any sane executor. */
  val defaultMaxGroups: Long = 4L << 20

  /** Top `k` rows per group, ordered by `orderBy` columns
    * ((name, ascending) — first rows under that ordering win). Column
    * references resolve against the analyzed child (the analyzer does not
    * resolve expressions inside third-party logical nodes). Registers
    * [[TopKStrategy]] on the session if absent. Supply a total ordering
    * (add a unique tiebreaker) for deterministic results.
    *
    * MEMORY GUARD — this two-plan design IS the final answer, not a stopgap:
    * [[TopKPerGroupExec]] holds one k-heap per group in an in-memory hash
    * map — O(groups x k) rows across the cluster with no spill path. That
    * is the right trade for the operator's target shape (bounded group
    * cardinality: accounts, users, categories, query batches), and making
    * the heap itself spill would forfeit exactly the O(n log k) / no-sort
    * advantage the operator exists for. So the entry point first estimates
    * group cardinality with one cheap `approx_count_distinct` pass and
    * routes high-cardinality inputs to [[windowPerGroup]] (sort-based,
    * spillable — Spark's window exec spills via its ExternalAppendOnlyMap),
    * which computes identical results for a total ordering. Pass
    * `maxGroups = Long.MaxValue` to skip the estimate job when the
    * cardinality is known small. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      maxGroups: Long = defaultMaxGroups): DataFrame = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, struct}
    if (maxGroups < Long.MaxValue) {
      val est = df.select(approx_count_distinct(
          struct(groupCols.map(col): _*), 0.1).as("g"))
        .head().getLong(0)
      if (est > maxGroups) return windowPerGroup(df, groupCols, orderBy, k)
    }
    heapPerGroup(df, groupCols, orderBy, k)
  }

  /** The spillable formulation (`row_number().over(window) <= k`): same
    * results as the heap operator for a total ordering, O(n log n) CPU but
    * disk-backed — the designated path when group cardinality is unbounded.
    * Public so callers that KNOW their cardinality is huge can skip
    * [[perGroup]]'s estimate pass. */
  def windowPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, row_number}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy.map { case (n, asc) =>
        if (asc) col(n).asc else col(n).desc }: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** The custom-operator path, unconditionally (no cardinality estimate). */
  private[plans] def heapPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${child.output.map(_.name).mkString(", ")}"))
    val ordering = orderBy.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.ofRows(spark,
      TopKPerGroupPlan(k, groupCols.map(attr), ordering, child))
  }
}
