package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Divide,
  Expression, Multiply, Sqrt, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Marker expression behind the SQL function `graft_cosine(a, b)`.
  *
  * Unevaluable on purpose: the user writes INTENT (cosine similarity),
  * and the [[CosineExpand]] optimizer rule lowers it to the engine's
  * codegen [[DotProduct]] kernels before physical planning — the
  * `Rule[LogicalPlan]` leg of the extension-point triad next to the
  * custom expressions (DotProduct et al.) and the custom planner
  * strategy (AsOfJoinStrategy). If the rule is not installed the query
  * fails loudly at execution rather than silently running a slow
  * fallback.
  */
case class CosineMarker(left: Expression, right: Expression)
    extends BinaryExpression with Unevaluable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMarker =
    copy(left = newLeft, right = newRight)
}

/** Lower [[CosineMarker]] to `dot(a,b) / sqrt(dot(a,a) * dot(b,b))` over
  * the codegen [[DotProduct]]. Scalar-function semantics: operands are
  * duplicated into the three dots (same as writing the expansion by
  * hand in SQL) — operators that rank millions of PAIRS should instead
  * precompute norms before the join like `Similarity.bruteForceTopK`.
  */
object CosineExpand extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineMarker(a, b) =>
        Divide(DotProduct(a, b),
          Sqrt(Multiply(DotProduct(a, a), DotProduct(b, b))))
    }
}
