package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: `row_number() OVER (PARTITION BY k ORDER BY o) <= K`
  * filters become [[TopKPerKey]] under the re-added window — existing
  * window queries get the sort-free plan without being rewritten by hand.
  *
  *   Filter(rn <= K)                 Window(rn)            ← ≤ K rows/key:
  *   +- Window(rn := row_number)  →  +- TopKPerKey(keys, order, K)
  *      +- child                        +- child              cheap sort
  *
  * The filter is dropped outright: after TopKPerKey every surviving row
  * has rn ∈ [1, K], so the predicate is a tautology. The Window stays so
  * the rn column (and schema) are exactly as before, but now sorts ≤ K
  * rows per key instead of the whole partition.
  *
  * Rewrites ONLY when provably equivalent:
  *  - the window computes exactly one expression, a `row_number()` (rank/
  *    dense_rank can exceed K rows on boundary ties; other window
  *    functions must see the WHOLE partition);
  *  - the predicate is `rn <= K` / `rn < K+1` / `rn = 1` on that alias;
  *  - the partition spec is non-empty bare attributes (a global window
  *    has no clustering key for the exchange).
  * Like Spark's own window-group-limit pushdown, a non-total ORDER BY
  * keeps row_number nondeterministic on ties either way — the rewrite
  * picks the same set a re-shuffled window run could have picked.
  *
  * Injected by `GraftExtensions` (`injectOptimizerRule`) or per-session
  * via `GraftOps.installRewrite(spark)` (kept separate from
  * [[GraftOps.install]] so constructing an explicit TopKPerKey never
  * silently re-plans unrelated window queries in the same session).
  */
object RankLimitToTopK extends Rule[LogicalPlan] {

  /** Above this K the heaps lose to a spillable sort — leave the window
    * plan alone (the same reasoning as Spark's own
    * `spark.sql.optimizer.windowGroupLimitThreshold`). Tunable. */
  val MaxKConf = "spark.graft.topk.rewrite.maxK"
  val DefaultMaxK = 1000

  /** Session kill-switch (default OFF): the rule is injected everywhere
    * the extensions class is configured, but only fires where enabled. */
  val EnabledConf = "spark.graft.topk.rewrite.enabled"

  /** cond → (rank attribute, K) when cond keeps exactly ranks 1..K.
    * Arithmetic in Long: `rn < Int.MinValue` must not wrap k−1 into a
    * huge positive K (it would turn an always-false filter into
    * keep-everything). */
  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Long)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k.toLong))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))        => Some((a, k.toLong - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k.toLong))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)     => Some((a, k.toLong - 1))
      case EqualTo(a: Attribute, Literal(1, IntegerType))              => Some((a, 1L))
      case EqualTo(Literal(1, IntegerType), a: Attribute)              => Some((a, 1L))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sqlConf = org.apache.spark.sql.internal.SQLConf.get
    // Opt-in: the extensions class injects this rule into every session of
    // a deployment; it must stay inert until the session enables it
    // (GraftOps.installRewrite does) — never silently re-plan queries.
    if (!sqlConf.getConfString(EnabledConf, "false").toBoolean) return plan
    val maxK = sqlConf.getConfString(MaxKConf, DefaultMaxK.toString).toLong
    plan.transformUp {
      case Filter(RankLimit(rn, k),
          w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, child, _))
          if k > 0 && k <= maxK &&
            rn.exprId == alias.exprId &&
            partitionSpec.nonEmpty &&
            partitionSpec.forall(_.isInstanceOf[Attribute]) &&
            orderSpec.nonEmpty =>
        val keys = partitionSpec.map(_.asInstanceOf[Attribute])
        w.copy(child = TopKPerKey(keys, orderSpec, k.toInt, child))
    }
  }
}
