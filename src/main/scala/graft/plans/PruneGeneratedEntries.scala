package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Partial evaluation of filter predicates over the literal fields of an
  * exploded struct array — the unpivot shape the facets / field_names /
  * field_values pipes compile to:
  *
  * {{{
  *   Filter(e.field_name IN ('a','b'), Generate(Explode(CreateArray(
  *     struct('a' AS field_name, col1 AS field_value),
  *     struct('_msg' AS field_name, _msg AS field_value), ...))))
  * }}}
  *
  * Catalyst pushes the IN through the Generate but then evaluates it per
  * exploded ROW: every excluded entry is still materialized from its
  * source column and filtered afterwards, so a facets query restricted to
  * two fields still scans and explodes every field — at store scale the
  * dominant cost is exactly those dead entries (and the columns they pin
  * in the scan's ReadSchema, defeating parquet column pruning).
  *
  * This rule decides each filter conjunct PER ARRAY ELEMENT at plan time:
  * substitute the element's field expressions for the struct accesses; if
  * the result folds to false/null, the element can never survive the
  * filter and is dropped from the array — shrinking the Generate and,
  * via column pruning, the scan itself. Conjuncts that don't fold (value
  * predicates, non-literal fields) keep the element. Runs inside the
  * operator-optimization fixpoint (injectOptimizerRule) or the
  * user-provided batch (ExperimentalMethods), where the main optimizer's
  * ColumnPruning realizes the scan-schema shrink.
  *
  * `outer` generates are left alone: explode_outer emits a null-struct
  * row for an emptied array, and a conjunct like isnull(e) would then
  * accept rows the unpruned plan never produced. */
object PruneGeneratedEntries extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        g @ Generate(Explode(arr: CreateArray), _, false, _, Seq(e), _)) =>
      val decidable = splitConjunctivePredicates(cond).filter(c =>
        c.deterministic && c.references.subsetOf(AttributeSet(e)))
      if (decidable.isEmpty) f
      else {
        def survives(elem: Expression): Boolean = elem match {
          case s: CreateNamedStruct =>
            decidable.forall { c =>
              val subst = c.transform {
                case GetStructField(a: AttributeReference, ord, _)
                    if a.exprId == e.exprId && ord < s.valExprs.length =>
                  s.valExprs(ord)
              }
              if (subst.references.nonEmpty || !subst.foldable) true
              else
                try subst.eval(null) == true
                catch { case _: Exception => true } // undecidable: keep
            }
          case _ => true
        }
        val kept = arr.children.filter(survives)
        if (kept.length == arr.children.length) f
        else if (kept.isEmpty) LocalRelation(f.output)
        else f.copy(child =
          g.copy(generator = Explode(arr.copy(children = kept))))
      }
  }
}
