package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §4 custom-Rule extension point): rewrites
  * the classic per-group top-k idiom
  *
  *   Project(cols not using rn)
  *     Filter(rn <= k)
  *       Window(rn := row_number() over (partition by g order by s))
  *
  * into the engine's TopKPerGroupPlan (partial heap → shuffle on g →
  * final heap). Spark's own WindowGroupLimit prunes shuffle input for
  * this pattern but still materializes the window (full sort + rank
  * projection) afterwards; because the row number is provably unused
  * above the filter, the rewrite drops the window stage entirely.
  *
  * Fires only when the pattern is exact: a single row_number window
  * expression, a bare `rn <= k` / `rn < k` / `rn = 1` predicate on it,
  * and a projection that references none of the window's outputs. Ties
  * beyond the sort order are resolved arbitrarily — identical to
  * row_number's own nondeterminism under non-total orders.
  *
  * Registered per-session via `TopKRewrite.enable(spark)` (experimental
  * methods) or for SQL users through `graft.GraftExtensions`
  * (injectOptimizerRule). */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w: Window))
        if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty &&
          w.partitionSpec.nonEmpty =>
      // partitionSpec.nonEmpty: a global (unpartitioned) top-k would
      // need ClusteredDistribution(Nil), which Spark rejects — leave
      // that shape to TakeOrderedAndProject.
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
          val rn = alias.toAttribute
          limitOf(cond, rn) match {
            case Some(k) if k >= 1 &&
                projectList.forall(_.references.subsetOf(w.child.outputSet)) =>
              Project(projectList,
                TopKPerGroupPlan(w.partitionSpec, w.orderSpec, k, w.child))
            case _ => p
          }
        case _ => p
      }
  }

  /** Idempotently register the rule + the strategy that plans the node. */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
