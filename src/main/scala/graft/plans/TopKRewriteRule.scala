package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, AttributeReference, Descending, Expression, LessThan, LessThanOrEqual, Literal, NullsFirst, NullsLast, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the ubiquitous
  * `row_number().over(partitionBy ... orderBy ...)` + `WHERE rank <= k`
  * idiom into the [[TopKPerGroup]] operator — turning the full
  * partition sort (O(n log n), spill-prone) the Window operator needs
  * into bounded per-group heaps (O(n log k), no sort, no spill),
  * transparently for any user query written in the standard idiom.
  *
  * Deliberately conservative — the rewrite fires only when:
  *  - the Window node computes exactly one expression: an aliased
  *    `row_number()` (rank/dense_rank change semantics → untouched);
  *  - every partition key and sort key is a plain column of the child,
  *    with unique names (the physical operator binds by name);
  *  - each sort key uses the default null ordering for its direction
  *    (the heap ordering implements exactly those);
  *  - the filter is a single `rank <= k` / `rank < k` conjunct over
  *    the rank attribute with a positive literal k.
  * Ties: `row_number` on a non-total order picks tied rows
  * arbitrarily; so does the heap — both are deterministic per plan,
  * neither guarantees WHICH tied row survives, so the rewrite does not
  * change the semantics contract.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private object PosIntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v > 0 => Some(v)
      case Literal(v: Long, LongType) if v > 0 && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }
  }

  private def defaultNulls(so: SortOrder): Boolean = (so.direction, so.nullOrdering) match {
    case (Ascending, NullsFirst) => true
    case (Descending, NullsLast) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond,
        w @ Window(Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(parts, order, _)), _)), _, _, child, _)) =>
      val k = cond match {
        case LessThanOrEqual(r: AttributeReference, PosIntLit(n))
            if r.exprId == a.exprId => Some(n)
        case LessThan(r: AttributeReference, PosIntLit(n))
            if r.exprId == a.exprId && n > 1 => Some(n - 1)
        case _ => None
      }
      val partAttrs = parts.collect { case ar: AttributeReference => ar }
      val sortAttrs = order.collect {
        case so @ SortOrder(ar: AttributeReference, _, _, Nil)
            if defaultNulls(so) => (ar, so.direction == Descending)
      }
      val usedNames = (partAttrs.map(_.name) ++ sortAttrs.map(_._1.name))
      val namesBindUniquely = usedNames.forall(n =>
        child.output.count(_.name == n) == 1)
      val allFromChild = (partAttrs ++ sortAttrs.map(_._1))
        .forall(ar => child.outputSet.contains(ar))
      // parts.nonEmpty: a global top-k (no PARTITION BY) must stay a
      // Window — TopKPerGroupExec declares ClusteredDistribution over
      // the group columns, and ClusteredDistribution(Nil) is illegal.
      if (k.isDefined && parts.nonEmpty && partAttrs.length == parts.length &&
          sortAttrs.length == order.length && order.nonEmpty &&
          namesBindUniquely && allFromChild) {
        val rankAttr = AttributeReference(a.name, IntegerType,
          nullable = false)(exprId = a.exprId, qualifier = a.qualifier)
        TopKPerGroup(child, partAttrs.map(_.name),
          sortAttrs.map { case (ar, desc) => ar.name -> desc }, k.get, rankAttr)
      } else Filter(cond, w)
  }
}
