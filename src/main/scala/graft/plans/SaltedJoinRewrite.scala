package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: automatic hot-key mitigation — the manual
  * [[graft.ops.SkewJoin.saltedJoin]] utility turned into engine
  * behavior for CONFIGURED keys.
  *
  * A deployment profiles its key histograms (`q_skew_profile`'s
  * aggregate is exactly this measurement), writes the hot join keys
  * into session conf, and every inner equi-join on such a key is
  * rewritten into the salted form:
  *
  * {{{
  *   Join(fact, dim, Inner, fact.k = dim.k)
  *   ⇒ Project(original output,
  *       Join(Project(fact.* , pmod(xxhash64(mid()), B) AS _salt),
  *            Generate(explode([0..B-1]) AS _salt, dim),
  *            Inner, fact.k = dim.k AND fact._salt = dim._salt))
  * }}}
  *
  * Each fact row still meets each matching dim row exactly once (the
  * salt only routes WHICH of the B (key, salt) partitions they meet
  * in), so results are unchanged; the hot key's rows spread over B
  * shuffle partitions instead of one. MEASURED (tools/SkewAB, 20M rows
  * / 90% one hot key / 1M-key dim, 5 round-robin reps, local[32]):
  * plain 7.46 s, plain+AQE skew-split 6.51 s, salted(8) 3.75 s — the
  * salt spreads the probe AND the join output ahead of downstream
  * aggregates, where AQE's split covers only the sort-merge read side
  * (full A/B table and when-to-prefer-AQE caveats in SkewJoin's
  * scaladoc).
  *
  * Contract and guards (the rule fires only when ALL hold):
  *  - `spark.graft.skewJoin.keys` lists the hot key COLUMN NAMES
  *    (comma-separated); empty (the default) disables the rule
  *    entirely — zero effect on un-configured sessions.
  *  - Inner join whose condition is a CONJUNCTION of equalities
  *    between attribute references, one per side each (single-key is
  *    the one-conjunct case; compound keys are the common fact-join
  *    shape — r8 verdict item 7). The LEFT side is the fact (skewed)
  *    side, and the rule fires when ANY fact-side key column of the
  *    join is configured: skew is a property of the key TUPLE, and a
  *    configured hot column concentrates tuples regardless of what
  *    it's paired with; salting is correct unconditionally (the salt
  *    only routes which partition matching rows meet in). Conditions
  *    with residual non-equality predicates and outer joins keep
  *    their plan (outer-join salting has NULL-extension subtleties
  *    the manual utility documents).
  *  - `spark.graft.skewJoin.buckets` (default 8) sets B; the dim side
  *    pays ×B row replication, which is why this must be opted into
  *    per key, never inferred silently.
  *  - Neither side already carries a `_salt` column, and the rewritten
  *    join (condition = key AND salt) no longer matches the pattern —
  *    the rule is idempotent under the optimizer's fixed point.
  *
  * Registered for every session through GraftExtensions
  * (injectOptimizerRule) or per-session via [[SaltedJoinRewrite.enable]].
  */
object SaltedJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val KeysConf = "spark.graft.skewJoin.keys"
  val BucketsConf = "spark.graft.skewJoin.buckets"

  /** per-session opt-in without session extensions */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SaltedJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SaltedJoinRewrite

  private def hotKeys: Set[String] =
    conf.getConfString(KeysConf, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  private def buckets: Int =
    try math.max(1, conf.getConfString(BucketsConf, "8").toInt)
    catch { case _: NumberFormatException => 8 }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val keys = hotKeys
    if (keys.isEmpty) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(joinCond), hint)
          if !left.output.exists(_.name == "_salt") &&
            !right.output.exists(_.name == "_salt") =>
        // every conjunct must be an equality orientable to
        // (fact attr from left, dim attr from right); widening casts
        // the analyzer inserts around mixed-width keys (int fact key
        // vs bigint dim key) don't change which attribute is compared
        def asAttr(e: Expression): Option[AttributeReference] = e match {
          case a: AttributeReference => Some(a)
          case Cast(a: AttributeReference, _, _, _) => Some(a)
          case _ => None
        }
        val oriented = splitConjunctivePredicates(joinCond).map {
          case EqualTo(l, r) =>
            (asAttr(l), asAttr(r)) match {
              case (Some(a), Some(b))
                  if left.outputSet.contains(a) && right.outputSet.contains(b) =>
                Some((a, b))
              case (Some(a), Some(b))
                  if left.outputSet.contains(b) && right.outputSet.contains(a) =>
                Some((b, a))
              case _ => None
            }
          case _ => None
        }
        if (oriented.forall(_.isDefined) &&
            oriented.flatten.exists(p => keys.contains(p._1.name))) {
          val nB = buckets
          // fact side: per-row routing salt (any value is correct —
          // task retries re-salting a row cannot change results)
          val saltL = Alias(
            Pmod(new XxHash64(Seq(MonotonicallyIncreasingID())),
              Literal(nB.toLong)), "_salt")()
          val saltedFact = Project(left.output :+ saltL, left)
          // dim side: replicate each row to every salt value
          val saltR = AttributeReference("_salt", LongType, nullable = false)()
          val explodedDim = Generate(
            Explode(CreateArray((0 until nB).map(i => Literal(i.toLong)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(saltR), child = right)
          val cond = And(joinCond, EqualTo(saltL.toAttribute, saltR))
          Project(j.output,
            Join(saltedFact, explodedDim, Inner, Some(cond), hint))
        } else j
    }
  }
}
