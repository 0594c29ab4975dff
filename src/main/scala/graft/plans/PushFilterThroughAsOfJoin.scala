package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsOfJoinPlan]] — the `Rule[LogicalPlan]`
  * a custom operator owes Catalyst (SURVEY.md §7.4 ladder (c)): the
  * built-in PushDownPredicates knows nothing about the node, so without
  * this rule `asof(l, r, ...).filter(p)` scans and as-of-merges BOTH full
  * inputs and filters last — at 100 TB that is the difference between a
  * partition-pruned scan and reading the whole fact table.
  *
  * What moves (each case provably result-identical):
  *  - LEFT-ONLY deterministic conjuncts: every output row extends exactly
  *    one left row with the left columns untouched (left-outer, 1:1), so
  *    filtering left rows before or after the merge is the same set.
  *  - Of those, conjuncts over the bare LEFT KEY are also MIRRORED to the
  *    right side with the key attribute substituted: a right row can only
  *    ever match a left row with an EQUAL key, so right rows whose key
  *    fails the predicate can never reach a surviving output row. (Null
  *    left keys produce null-extended output without consulting the right
  *    side, so dropping right rows never affects them.)
  *  - Everything else — right-referencing or nondeterministic conjuncts —
  *    stays ABOVE the join: filtering the right side on a non-key column
  *    would re-match earlier right rows instead of dropping the output
  *    row (as-of picks the LATEST matching row, so right-side filters
  *    change which row matches, not just whether one does).
  *
  * Runs in the fixed-point user batch: when nothing is pushable the plan
  * is returned unchanged (structural fixed point); once pushed, the
  * remaining conjuncts are never left-only, so the rule cannot loop.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j @ AsOfJoinPlan(l, r, lk, rk, _, _, _)) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(l.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val mirrored = (lk, rk) match {
          case (la: AttributeReference, ra: AttributeReference) =>
            leftOnly
              .filter(_.references == AttributeSet(la :: Nil))
              .map(_.transform {
                case a: AttributeReference if a.semanticEquals(la) => ra
              })
          case _ => Nil
        }
        val pushed = j.copy(
          left = Filter(leftOnly.reduce(And), l),
          right = mirrored.reduceOption(And).map(Filter(_, r)).getOrElse(r))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
