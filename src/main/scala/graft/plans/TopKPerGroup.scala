package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension demo (SURVEY §2.2 "custom operator" path c):
  * top-K rows per group as a FIRST-CLASS physical operator.
  *
  * The composable formulation — `row_number().over(partitionBy(g).orderBy
  * (o)) <= k` — must SORT every group in full. This operator instead keeps
  * a bounded K-heap per group in one pass: requiredChildDistribution
  * clusters by the group keys (Catalyst inserts the single hash exchange),
  * then each partition streams its rows through per-group heaps — O(n log k)
  * with K×|groups| memory, no sort buffer, no spill pressure from ordering.
  * At 100 TB with small K this is the difference between a shuffle+sort and
  * a shuffle+scan.
  *
  * Wiring: [[TopKPerGroupPlan]] (logical) → [[TopKStrategy]] (planner rule,
  * injected via `spark.experimental.extraStrategies`) → [[TopKPerGroupExec]]
  * (physical). Entry point: [[TopKPerGroup.apply]].
  */
case class TopKPerGroupPlan(
    k: Int,
    groupExprs: Seq[Expression],
    order: SortOrder,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: SortOrder,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupLocal = groupExprs
    val orderExpr = order.child
    val descending = order.direction == Descending
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupLocal, childOutput)
      val keyEval = orderExpr // bound below per-row via InterpretedOrdering semantics
      val boundKey = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(keyEval, childOutput)
      val baseOrd = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
      // heap keeps the WORST retained entry on top so it can be evicted
      val entryOrd = new Ordering[(Any, UnsafeRow)] {
        override def compare(a: (Any, UnsafeRow), b: (Any, UnsafeRow)): Int = {
          // "greater" per this ordering == better (more worth retaining):
          // larger values for descending top-k, smaller for ascending
          val c = baseOrd.compare(a._1, b._1)
          if (descending) c else -c
        }
      }
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]()
      iter.foreach { row =>
        val key = groupProj(row.asInstanceOf[InternalRow])
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[(Any, UnsafeRow)](entryOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        val ordVal = boundKey.eval(row)
        if (heap.size < kLocal) {
          heap.enqueue((ordVal, row.asInstanceOf[UnsafeRow].copy()))
        } else if (entryOrd.compare((ordVal, null), heap.head) > 0) {
          heap.dequeue()
          heap.enqueue((ordVal, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator.map(_._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Top-K rows per group, ordered by `orderCol` (desc by default). */
  def apply(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      k: Int,
      desc: Boolean = true): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val lp = df.queryExecution.analyzed
    val resolve = lp.output.map(a => a.name -> a).toMap
    def attr(name: String): Attribute =
      resolve.getOrElse(name, sys.error(s"column $name not in ${lp.output.map(_.name)}"))
    val order = SortOrder(attr(orderCol), if (desc) Descending else Ascending)
    graft.sparkutil.DatasetFactory.ofRows(spark,
      TopKPerGroupPlan(k, groupCols.map(attr), order, lp))
  }
}
