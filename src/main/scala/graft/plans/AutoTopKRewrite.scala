package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer `Rule[LogicalPlan]` (SURVEY.md §2.10 injection surface): rewrites
  * the idiomatic top-k-per-key window formulation
  *
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(p).orderBy(o)))
  *      .filter(col("rn") <= k) }}}
  *
  * into the bounded-heap [[TopKPerKey]] stack, so code written the stock way
  * gets the map-side pre-selection plan automatically. The rewrite keeps the
  * original `Window` and `Filter` on top of the inserted [[TopKPerKey]]:
  *
  *   - [[TopKPerKey]] reduces each key to its true top-k rows (this is the
  *     expensive part: heaps instead of shuffle-everything + sort-partition);
  *   - the retained `Window` recomputes `row_number` over <= k rows per key —
  *     with the rule's required total order the prefix ranks 1..k are
  *     preserved under taking the top-k subset, so the recomputed numbers
  *     equal the original formulation's bit-for-bit;
  *   - the retained `Filter` re-applies the full original predicate, so any
  *     additional conjuncts (and the `rn` bound itself, now vacuous) keep
  *     their semantics and the output schema is unchanged.
  *
  * Soundness of the bound extraction: the filter condition is split into
  * conjuncts and any conjunct of the form `rn <= lit` / `rn < lit` /
  * `rn = lit` (either operand order) yields an upper bound; a conjunction
  * implies each conjunct, so top-bound(k) rows are a superset of the rows any
  * such filter keeps. Disjunctions contribute no bound and block the rewrite.
  * Only [[RowNumber]] qualifies — `rank()`/`dense_rank()` can emit MORE than
  * k rows for `rank <= k` (ties), which a k-capped heap would lose.
  *
  * Spark's own `InferWindowGroupLimit` fires on the same shape and inserts a
  * [[WindowGroupLimit]] under the `Window`; when this rule runs after it (the
  * `experimental.extraOptimizations` batch is the optimizer's last), the node
  * is stripped and replaced — TopKPerKey subsumes it (group limits cut rows
  * per partition BEFORE the shuffle too, but still feed the full WindowExec
  * sort; TopKPerKey replaces the sort itself).
  *
  * Guard rails: k must be a positive int literal and <= `maxRewriteK`
  * (-Dgraft.topk.rewriteMaxK, default 1024) — for huge k the heap's O(keys*k)
  * retained rows lose to Spark's spillable sort, so the stock plan stands.
  * Idempotent: a `Window` whose child is already [[TopKPerKey]] is left alone
  * (matters in fixed-point batches and AQE re-optimization).
  */
object AutoTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  def maxRewriteK: Int =
    sys.props.get("graft.topk.rewriteMaxK").map(_.toInt).getOrElse(1024)

  /** Tightest upper bound on `rn` implied by the conjuncts of `cond`. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] = {
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v)
      case EqualTo(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v)
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v)
      case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w @ Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, wchild, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      // WindowGroupLimit under the Window is InferWindowGroupLimit's work on
      // this same pattern — subsumed by TopKPerKey, strip it.
      val inner = wchild match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      if (inner.isInstanceOf[TopKPerKey]) f
      else bound(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= maxRewriteK =>
          f.copy(child = w.withNewChildren(
            Seq(TopKPerKey(partitionSpec, orderSpec, k, inner))))
        case _ => f
      }
  }
}
