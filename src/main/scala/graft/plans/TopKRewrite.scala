package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the row_number-window top-k idiom
  *
  * {{{ Project(cols without rn,
  *       Filter(rn <= k,
  *         Window(row_number() OVER (PARTITION BY p ORDER BY o DESC, t ASC) AS rn, child))) }}}
  *
  * into the heap-based [[TopKPerKey]] custom operator — one pass,
  * bounded memory, NO per-partition sort (Spark's own
  * InferWindowGroupLimit still sorts; it only prunes rows first).
  *
  * Fires only when the rewrite is provably safe:
  *  - single row_number window expression, default/row frame;
  *  - ORDER BY is exactly (numeric DESC NULLS LAST, numeric ASC NULLS
  *    FIRST) — the Spark defaults for `desc, asc`, and the operator's
  *    ranking contract; explicit non-default null orderings are left
  *    on the window path;
  *  - partition/order keys are plain attributes with unambiguous names;
  *  - the rank column is dropped by the enclosing projection (the heap
  *    operator does not produce it).
  *
  * Registered per-session via TopK.enableAutoRewrite or for every
  * session through GraftExtensions (injectOptimizerRule).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def numeric(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | LongType | IntegerType => true
    case _ => false
  }

  /** k from `rn <= k`-shaped predicates (either operand order). The
    * strict forms guard v > Int.MinValue: v - 1 would wrap an
    * always-false `rn < Int.MinValue` into top-Int.MaxValue. The
    * un-rewritten window path handles the degenerate filter correctly. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case _ => None
  }

  private def defaultRowFrame(frame: Expression): Boolean = frame match {
    case UnspecifiedFrame => true
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  /** TopKPerKeyExec prunes map-side itself — drop an inferred
    * WindowGroupLimit so the work isn't done twice. */
  private def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case WindowGroupLimit(_, _, _, _, inner) => inner
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(partSpec,
                Seq(SortOrder(o: AttributeReference, Descending, NullsLast, _),
                    SortOrder(t: AttributeReference, Ascending, NullsFirst, _)), frame)), _)),
            _, _, wchild, _)))
        if defaultRowFrame(frame) &&
          numeric(o.dataType) && numeric(t.dataType) && o.name != t.name &&
          // nonEmpty: a global top-k has no clustering keys for the
          // final stage's ClusteredDistribution (Spark rejects Nil) —
          // leave it on the window path
          partSpec.nonEmpty &&
          partSpec.forall(_.isInstanceOf[AttributeReference]) &&
          !p.references.contains(al.toAttribute) && {
            // name-based resolution in the operator must be unambiguous
            val names = wchild.output.map(_.name)
            names.distinct.size == names.size
          } =>
      // k bound ONCE — guard and rewrite body cannot desynchronize
      limitOf(cond, al.toAttribute) match {
        case Some(k) if k >= 1 =>
          val partNames = partSpec.map(_.asInstanceOf[AttributeReference].name)
          Project(projectList,
            TopKPerKey(k, partNames, o.name, t.name, stripGroupLimit(wchild)))
        case _ => p
      }
  }
}
