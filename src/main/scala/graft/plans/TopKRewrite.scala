package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the canonical top-k-per-group window pattern
  *
  *   Project(cols without rn)
  *     Filter(rn <= k)                 -- or rn < k+1
  *       Window([rn := row_number() over (partition by g order by o)])
  *         child
  *
  * into [[TopKPerGroupNode]] — the k-bounded-heap whole-operator — so ANY
  * query written in the standard window style (including SQL) gets the
  * O(n log k) physical plan without the full per-group sort.
  *
  * Guards (all must hold, else the plan is left untouched):
  *  - exactly one window expression, and it is row_number();
  *  - non-empty partition spec (a global row_number is a different op);
  *  - the filter condition is exactly `rn <= lit` / `rn < lit` on the
  *    row_number attribute;
  *  - the parent Project does not reference rn (the rewrite removes it).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def asLimit(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
      if a.exprId == rnId => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
            _, _, child, _)))
        if partitionSpec.nonEmpty &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) &&
          orderSpec.nonEmpty &&
          !projectList.exists(_.exists {
            case a: AttributeReference => a.exprId == alias.exprId
            case _ => false
          }) =>
      asLimit(cond, alias.exprId) match {
        case Some(k) if k > 0 =>
          val node = TopKPerGroupNode(
            partitionSpec.map(_.asInstanceOf[Attribute]), orderSpec, k, child)
          Project(projectList, node)
        case _ => p
      }
  }
}
