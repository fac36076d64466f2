package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Implied-predicate extraction from OR-of-conjunctions — the classic
  * multi-table disjunction shape Catalyst cannot push down on its own:
  *
  * {{{ WHERE (n1.name = 'A' AND n2.name = 'B')
  *        OR (n1.name = 'B' AND n2.name = 'A') }}}
  *
  * No single disjunct survives below the join (each references both
  * sides), so without help the whole corpus-sized join tree
  * materializes before the filter runs. But each branch IMPLIES a
  * narrower fact — here `n1.name IN ('A','B')` and `n2.name IN
  * ('A','B')` — and the OR of per-branch fragments over one attribute
  * set is implied by the whole disjunction. This rule derives those
  * fragments and conjoins them; the standard pushdown batch (same
  * fixed point) then moves each to its scan. TPC-H Q7 (h07) and Q19
  * (h19) are the canonical beneficiaries; with CBO join reorder the
  * newly filtered dimensions also move earlier in the join order.
  *
  * Soundness: for each branch, the AND of its conjuncts whose
  * references fall inside a candidate attribute set S is implied by
  * that branch; the OR of those per-branch ANDs is therefore implied
  * by the original disjunction, so `And(cond, derived)` keeps cond's
  * row semantics (in filter/join context NULL rejects like FALSE, and
  * derived can only be TRUE or NULL when cond is NULL — never FALSE).
  *
  * Convergence: a derived clause is only added when it is not already
  * a conjunct here AND not already in the child's constraint set —
  * after pushdown relocates the clause below, the child's propagated
  * constraints report it, so the rule never re-adds what an earlier
  * iteration pushed (the InferFiltersFromConstraints discipline).
  * Requires constraint propagation (on by default); the rule is a
  * no-op when that is disabled, since without constraints the
  * added-then-pushed clause would be re-derived every iteration.
  *
  * Candidate sets are the reference sets of the first branch's
  * conjuncts, each strictly narrower than the whole OR's references;
  * disjunctions wider than [[DeriveOrBranchPredicates.MaxBranches]]
  * are left alone (expansion is quadratic in branches x conjuncts).
  */
case class DeriveOrBranchPredicates(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import DeriveOrBranchPredicates.MaxBranches

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.constraintPropagationEnabled) return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val fresh = derive(cond).filterNot(child.constraints.contains)
        if (fresh.isEmpty) f
        else Filter((splitConjunctivePredicates(cond) ++ fresh).reduce(And), child)
      case j @ Join(left, right, _, Some(cond), _) =>
        // A clause referencing only one side is redundant once that
        // side's constraints carry it (pushed by a prior iteration).
        val fresh = derive(cond).filterNot { d =>
          (d.references.subsetOf(left.outputSet) && left.constraints.contains(d)) ||
            (d.references.subsetOf(right.outputSet) && right.constraints.contains(d))
        }
        if (fresh.isEmpty) j
        else j.copy(condition = Some((splitConjunctivePredicates(cond) ++ fresh).reduce(And)))
    }
  }

  /** Implied single-attribute-set clauses of `cond`'s disjunctive
    * conjuncts, minus anything already conjoined at this node. */
  private def derive(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val derived = conjuncts.flatMap {
      case or: Or =>
        val branches = splitDisjunctivePredicates(or)
        if (branches.size > MaxBranches) Nil
        else {
          val branchConjuncts =
            branches.map(splitConjunctivePredicates(_).filter(_.deterministic))
          branchConjuncts.head.map(_.references).distinct
            .filter(s => s.nonEmpty && !or.references.subsetOf(s))
            .flatMap { s =>
              val perBranch = branchConjuncts.map(_.filter(_.references.subsetOf(s)))
              if (perBranch.exists(_.isEmpty)) None
              else Some(perBranch.map(_.reduce(And)).reduce(Or))
            }
        }
      case _ => Nil
    }
    derived
      .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      .foldLeft(Seq.empty[Expression]) { (acc, d) =>
        if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
      }
  }
}

object DeriveOrBranchPredicates {
  /** Disjunction-width cap: wider ORs (generated IN-lists rewritten as
    * ORs, rule-engine output) get no derivation — the useful cases
    * (Q7-style nation pairs, Q19-style bracket triples) are narrow. */
  val MaxBranches = 8
}
