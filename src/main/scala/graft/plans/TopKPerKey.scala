package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}

/** Custom whole-operator: top-k rows per key WITHOUT sorting.
  *
  * Spark expresses top-k-per-key as window row_number + filter, which
  * sorts every partition by (key, order) before ranking. This operator
  * keeps a bounded k-element heap per key in a single pass — O(n log k)
  * with memory bounded by keys × k, no sort at all. The planner
  * inserts the hash exchange via requiredChildDistribution, so the
  * operator composes with AQE like any built-in.
  *
  * Ordering contract: rows rank by (orderCol DESC, tieCol ASC) —
  * deterministic under ties like the window formulation it replaces.
  */
case class TopKPerKey(k: Int, groupCols: Seq[String], orderCol: String,
    tieCol: String, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // the ranking columns are consumed even when no downstream projection
  // uses them — declare them so column pruning keeps them alive
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet = {
    val needed = (groupCols :+ orderCol :+ tieCol).toSet
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => needed.contains(a.name)))
  }
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

case class TopKPerKeyExec(k: Int, groupCols: Seq[String], orderCol: String,
    tieCol: String, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"TopKPerKey: column $name not in ${child.output}"))

  // two-stage like hash aggregation: the partial instance runs on the
  // map side with whatever distribution the child has (pruning each
  // input partition to ≤ k rows per key BEFORE the shuffle); the final
  // instance demands co-location and computes the true top-k.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(groupCols.map(attr): Seq[Expression])) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val groupIdx = groupCols.map(n => out.indexWhere(_.name == n))
    val groupTypes = groupIdx.map(out(_).dataType)
    val orderIdx = out.indexWhere(_.name == orderCol)
    val orderType = out(orderIdx).dataType
    val tieIdx = out.indexWhere(_.name == tieCol)
    val tieType = out(tieIdx).dataType
    val kk = k

    child.execute().mapPartitions({ iter =>
      def num(row: InternalRow, i: Int, dt: org.apache.spark.sql.types.DataType): Double =
        dt match {
          case DoubleType => row.getDouble(i)
          case FloatType => row.getFloat(i).toDouble
          case LongType => row.getLong(i).toDouble
          case IntegerType => row.getInt(i).toDouble
          case other => throw new IllegalArgumentException(s"unsupported order type $other")
        }
      // rank: HIGHER value wins; on equal value, LOWER tie wins.
      // heap head must be the currently-worst kept row.
      final case class Entry(v: Double, tie: Double, row: InternalRow)
      val worstFirst: Ordering[Entry] = (a: Entry, b: Entry) => {
        val c = java.lang.Double.compare(b.v, a.v) // smaller v = worse = "greater"
        if (c != 0) c else java.lang.Double.compare(a.tie, b.tie) // larger tie = worse
      }
      // transient keys (may point into the reused row buffer) are fine
      // for lookup; only a NEW bucket's key must be made durable, and
      // rows are only copied when they actually enter a heap — the
      // common rejected row is never copied.
      def keyOf(r: InternalRow, durable: Boolean): Seq[Any] =
        groupIdx.zip(groupTypes).map { case (i, dt) =>
          r.get(i, dt) match {
            case s: org.apache.spark.unsafe.types.UTF8String if durable => s.clone()
            case v => v
          }
        }
      val heaps = new java.util.HashMap[Seq[Any], scala.collection.mutable.PriorityQueue[Entry]]()
      while (iter.hasNext) {
        val r = iter.next()
        val rv = num(r, orderIdx, orderType)
        val rt = num(r, tieIdx, tieType)
        var h = heaps.get(keyOf(r, durable = false))
        if (h == null) {
          h = scala.collection.mutable.PriorityQueue.empty[Entry](worstFirst)
          heaps.put(keyOf(r, durable = true), h)
        }
        if (h.size < kk) h.enqueue(Entry(rv, rt, r.copy()))
        else {
          val worst = h.head
          val better = rv > worst.v || (rv == worst.v && rt < worst.tie)
          if (better) { h.dequeue(); h.enqueue(Entry(rv, rt, r.copy())) }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator.map(_.row))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

/** Planner strategy mapping the logical node to the exec. Registered
  * per-session via `spark.experimental.extraStrategies` (or through
  * GraftExtensions). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, g, o, t, child) =>
      TopKPerKeyExec(k, g, o, t, partial = false,
        TopKPerKeyExec(k, g, o, t, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Public API: top-k rows per key, ranked (orderCol DESC, tieCol ASC). */
  def perKey(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCol: String, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      TopKPerKey(k, groupCols, orderCol, tieCol, df.queryExecution.analyzed))
  }

  /** Enable the automatic row_number-top-k → heap-operator rewrite
    * (TopKRewrite) on an existing session. Extension-built sessions
    * get this through GraftExtensions instead. */
  def enableAutoRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }

  /** Disable the automatic rewrite (test hygiene). */
  def disableAutoRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
  }
}
