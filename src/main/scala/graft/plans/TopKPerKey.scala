package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType}

/** Custom whole-operator: top-k rows per key WITHOUT sorting.
  *
  * Spark expresses top-k-per-key as window row_number + filter, which
  * sorts every partition by (key, order) before ranking. This operator
  * keeps a bounded k-element heap per key in a single pass — O(n log k)
  * with memory bounded by keys × k, no sort at all. The map-side
  * (partial) stage additionally caps its buffered entries
  * (`graft.topk.partialFlushEntries`, default 2^20) and flushes to the
  * shuffle when exceeded, so memory stays bounded even when the
  * grouping key's cardinality scales with the data. The planner
  * inserts the hash exchange via requiredChildDistribution, so the
  * operator composes with AQE like any built-in.
  *
  * Ordering contract — exactly the Spark defaults for `desc, asc`:
  * rows rank by (orderCol DESC NULLS LAST, tieCol ASC NULLS FIRST),
  * deterministic under ties like the window formulation it replaces.
  * Numeric comparison matches Spark's sort total order: NaN ranks
  * greatest, -0.0 == 0.0 (SPARK-26021 semantics — the tie column
  * decides between them), and integral values compare exactly (no
  * double narrowing — full 64-bit precision). Group keys may be any
  * data type: grouping goes through an UnsafeProjection with
  * floating-point canonicalization, so binary / struct / array keys
  * hash and compare by value and ±0.0 keys land in one group.
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

  // the operator filters rows in place (mapPartitions,
  // preservesPartitioning) — report the child's partitioning so a
  // downstream groupBy/join on the same keys reuses the exchange the
  // final stage demanded instead of shuffling again (the window
  // formulation propagates it; without this override the rewrite
  // would silently cost one extra exchange in composed plans)
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val groupIdx = groupCols.map(n => out.indexWhere(_.name == n))
    val orderIdx = out.indexWhere(_.name == orderCol)
    val orderType = out(orderIdx).dataType
    val tieIdx = out.indexWhere(_.name == tieCol)
    val tieType = out(tieIdx).dataType
    // fail on the driver, not per-task, for unsupported ranking types
    Seq(orderType, tieType).foreach {
      case DoubleType | FloatType | LongType | IntegerType => ()
      case other => throw new IllegalArgumentException(s"unsupported order type $other")
    }
    val kk = k
    // Memory bound for the map-side stage: the partial instance holds
    // one k-heap per distinct key seen in its input split, which is
    // unbounded for high-cardinality keys (user-level top-k over a
    // 100 TB table). Like partial hash aggregation's fallback, flush
    // (emit + clear) once the buffered entries exceed a cap — the
    // flushed rows are a superset of each key's split-local top-k, and
    // the final stage recomputes the true top-k after the shuffle, so
    // flushing never changes results, only map-side reduction ratio.
    // The final stage must keep every key of its shuffle partition (a
    // flush there WOULD drop rows), so it never flushes.
    val maxEntries =
      if (!partial) Long.MaxValue
      else conf.getConfString("graft.topk.partialFlushEntries", (1 << 20).toString).toLong
    // a non-positive cap would make fill() consume nothing while
    // hasNext retries forever — fail on the driver instead of hanging
    // every map task
    require(maxEntries > 0,
      s"graft.topk.partialFlushEntries must be positive, got $maxEntries")

    child.execute().mapPartitions({ iter =>
      // Monotone double→long map (Lucene's sortableDoubleBits) over
      // ZERO-FOLDED input: Spark's sort order (nanSafeCompareDoubles /
      // the SPARK-26021 radix-sort prefix) treats -0.0 == 0.0, so fold
      // the sign before the bit trick or the two zeros would rank
      // strictly and steal the tie-break from the tie column. NaN is
      // canonical via doubleToLongBits and ranks greatest. Integral
      // types pass through exactly, so longs never lose precision.
      def sortable(d: Double): Long = {
        val z = if (d == 0.0d) 0.0d else d // folds -0.0
        val b = java.lang.Double.doubleToLongBits(z)
        b ^ ((b >> 63) & Long.MaxValue)
      }
      def num(row: InternalRow, i: Int, dt: DataType): Long = dt match {
        case DoubleType => sortable(row.getDouble(i))
        case FloatType => sortable(row.getFloat(i).toDouble)
        case LongType => row.getLong(i)
        case IntegerType => row.getInt(i).toLong
        case other => throw new IllegalArgumentException(s"unsupported order type $other")
      }
      // rank: (order DESC NULLS LAST, tie ASC NULLS FIRST) — true iff
      // row a ranks strictly before row b.
      def ranksBefore(aVN: Boolean, aV: Long, aTN: Boolean, aT: Long,
          bVN: Boolean, bV: Long, bTN: Boolean, bT: Long): Boolean = {
        if (aVN != bVN) !aVN // non-null order value beats null (NULLS LAST under DESC)
        else if (!aVN && aV != bV) aV > bV
        else if (aTN != bTN) aTN // null tie ranks first (NULLS FIRST under ASC)
        else !aTN && aT < bT
      }
      final case class Entry(vNull: Boolean, v: Long, tieNull: Boolean,
          tie: Long, row: InternalRow)
      // heap head must be the currently-worst kept row
      val worstFirst: Ordering[Entry] = (a: Entry, b: Entry) => {
        if (ranksBefore(a.vNull, a.v, a.tieNull, a.tie, b.vNull, b.v, b.tieNull, b.tie)) -1
        else if (ranksBefore(b.vNull, b.v, b.tieNull, b.tie, a.vNull, a.v, a.tieNull, a.tie)) 1
        else 0
      }
      // Group keys via UnsafeProjection: value-based hashCode/equals for
      // every data type (strings, binary, structs, arrays). The
      // projection reuses its buffer, so lookups are allocation-free;
      // only a NEW bucket's key is copied, and rows are only copied
      // when they actually enter a heap — the common rejected row costs
      // nothing.
      // Floating-point group keys are canonicalized (-0.0 → 0.0, one
      // NaN bit pattern, recursively through nested types) exactly as
      // the optimizer's NormalizeFloatingNumbers rule does for
      // Aggregate/Window keys — without it the UnsafeRow byte-equality
      // below would split ±0.0 into two groups the window formulation
      // merges. No-op for non-floating key types.
      val keyProj = UnsafeProjection.create(
        groupIdx.map(i => org.apache.spark.sql.GraftPlanBridge.normalizeFloats(
          BoundReference(i, out(i).dataType, out(i).nullable)): Expression))
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private val heaps =
          new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]()
        private var entryCount = 0L
        private var drain: Iterator[InternalRow] = Iterator.empty

        // consume input until the entry cap forces a flush (or input
        // ends), then snapshot-and-clear the heaps into `drain`
        private def fill(): Unit = {
          while (iter.hasNext && entryCount < maxEntries) {
            val r = iter.next()
            val rvNull = r.isNullAt(orderIdx)
            val rv = if (rvNull) 0L else num(r, orderIdx, orderType)
            val rtNull = r.isNullAt(tieIdx)
            val rt = if (rtNull) 0L else num(r, tieIdx, tieType)
            val key = keyProj(r)
            var h = heaps.get(key)
            if (h == null) {
              h = scala.collection.mutable.PriorityQueue.empty[Entry](worstFirst)
              heaps.put(key.copy(), h)
            }
            if (h.size < kk) {
              h.enqueue(Entry(rvNull, rv, rtNull, rt, r.copy()))
              entryCount += 1
            } else {
              val w = h.head
              if (ranksBefore(rvNull, rv, rtNull, rt, w.vNull, w.v, w.tieNull, w.tie)) {
                h.dequeue(); h.enqueue(Entry(rvNull, rv, rtNull, rt, r.copy()))
              }
            }
          }
          if (!heaps.isEmpty) {
            val snapshot = heaps.values().asScala.toArray
            heaps.clear()
            entryCount = 0L
            drain = snapshot.iterator.flatMap(_.iterator.map(_.row))
          }
        }

        override def hasNext: Boolean = {
          while (!drain.hasNext && iter.hasNext) fill()
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("TopKPerKey drained")
          drain.next()
        }
      }
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
  /** Public API: top-k rows per key, ranked
    * (orderCol DESC NULLS LAST, tieCol ASC NULLS FIRST). */
  def perKey(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCol: String, tieCol: String): DataFrame = {
    // global (ungrouped) top-k has no clustering keys for the final
    // stage's ClusteredDistribution — Spark rejects an empty clustering
    // at planning with an opaque require; fail here with the fix
    require(groupCols.nonEmpty,
      "TopK.perKey needs at least one group column; for a global top-k " +
        "use orderBy(desc(orderCol), asc(tieCol)).limit(k)")
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
