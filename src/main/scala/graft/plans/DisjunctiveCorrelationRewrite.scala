package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{And, Exists, Expression,
  InSubquery, ListQuery, NamedExpression, Not, Or, OuterReference,
  SubExprUtils, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Filter,
  LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Closes the disjunctive-correlation cliff (BASELINE.md round 18,
  * SubfuzzRepro seeds 93/248/397): Spark 4.1.2's EXISTS/IN
  * decorrelation only pulls up correlated predicates from CONJUNCTIVE
  * position, and a legal ANSI query like
  *
  * {{{
  * SELECT c_custkey FROM customer
  * WHERE EXISTS (SELECT 1 FROM orders
  *               WHERE (o_custkey = customer.c_custkey AND p1) OR p2)
  * }}}
  *
  * dies inside the optimizer with a bare `None.get`
  * (PullupCorrelatedPredicates) or INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
  * (nested form) instead of either executing or refusing cleanly.
  * DuckDB executes it. This analyzer-phase rule restores the
  * semantics with an identity that is EXACT under three-valued logic:
  *
  *   EXISTS(σ[A ∨ B](R))  ≡  EXISTS(σ[A](R)) OR EXISTS(σ[B](R))
  *   x IN (Π[v](σ[A ∨ B](R)))  ≡  x IN (Π[v](σ[A](R))) OR x IN (Π[v](σ[B](R)))
  *
  * (Filter keeps rows where the predicate IS TRUE; `A∨B` is TRUE iff
  * A is TRUE or B is TRUE, so the kept-row sets union exactly. IN
  * only inspects the VALUE SET of the subquery, so branch overlap —
  * rows satisfying both A and B — cannot double-count; the UNKNOWN
  * case also distributes: `x IN S₁∪S₂` is UNKNOWN iff no comparison
  * is TRUE and some is UNKNOWN, which equals `IN S₁ OR IN S₂` under
  * Kleene OR.)
  *
  * The condition is expanded just enough that no OR remains above a
  * correlated reference inside any branch (AND distributed over OR on
  * the correlated paths only, NOT pushed through by De Morgan), each
  * branch becomes its own conjunctive-correlation subquery — the
  * shape Spark's RewritePredicateSubquery plans as an ExistenceJoin
  * cascade — and the branches are OR'ed. Expansion is capped at
  * [[maxBranches]]; shapes past the cap, or where the disjunctive
  * correlation sits somewhere a filter-split is not provably sound
  * (under a join inside the subquery, inside a CASE arm, under an
  * aggregate), are left for [[DisjunctiveCorrelationCheck]] to refuse
  * with a clean named error instead of Spark's internal one.
  *
  * Runs once per query as a post-hoc resolution rule (the optimizer
  * hook is too late: injected operator-optimization rules run after
  * PullupCorrelatedPredicates has already crashed).
  */
object DisjunctiveCorrelationRewrite extends Rule[LogicalPlan] {

  /** Expansion cap: the rewrite multiplies subquery branches, so a
    * pathological predicate is refused (cleanly) rather than planned
    * into a 2^n ExistenceJoin cascade.
    */
  val maxBranches = 16

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case op => op.transformExpressionsUp {
        case e @ Exists(sub, _, _, joinCond, hint)
            if joinCond.isEmpty && needsRewrite(sub) =>
          rebuildBranches(sub) match {
            case Some(branches) =>
              branches.map { b =>
                Exists(b, SubExprUtils.getOuterReferences(b),
                  NamedExpression.newExprId, Seq.empty, hint)
              }.reduceLeft[Expression](Or(_, _))
            case None => e
          }
        case in @ InSubquery(values,
            ListQuery(sub, _, _, numCols, joinCond, hint))
            if joinCond.isEmpty && needsRewrite(sub) =>
          rebuildBranches(sub) match {
            case Some(branches) =>
              branches.map { b =>
                InSubquery(values,
                  ListQuery(b, SubExprUtils.getOuterReferences(b),
                    NamedExpression.newExprId, numCols, Seq.empty, hint))
              }.reduceLeft[Expression](Or(_, _))
            case None => in
          }
      }
    }

  /** OuterReference belonging to THIS scope somewhere in `e`. The
    * traversal stops at nested [[SubqueryExpression]] nodes: their
    * `outerAttrs` children are OuterReference-wrapped attributes of
    * the NESTED subquery's outer scope (this level or deeper — Spark
    * rejects two-hop correlation at analysis), so `p OR EXISTS(inner
    * one-hop-correlated)` is NOT disjunctive correlation at this
    * level and must neither split nor refuse.
    */
  private[plans] def outerHere(e: Expression): Boolean = e match {
    case _: OuterReference => true
    case _: SubqueryExpression => false
    case other => other.children.exists(outerHere)
  }

  /** Correlation to THIS subquery's outer scope somewhere under an OR
    * in the condition — the exact class Spark 4.1.2's decorrelation
    * crashes on.
    */
  private def disjunctiveOuter(cond: Expression): Boolean = cond.exists {
    case o: Or => outerHere(o)
    case _ => false
  }

  /** The subquery plan has a top-position Filter (under wrappers that
    * are transparent to row EXISTENCE) whose condition is
    * disjunctively correlated.
    */
  private def needsRewrite(sub: LogicalPlan): Boolean =
    topFilter(sub).exists { case (f, _) =>
      // a nondeterministic predicate would be re-evaluated per branch,
      // so splitting it is not an identity — leave it alone
      f.condition.deterministic && disjunctiveOuter(f.condition)
    }

  /** Strip wrappers under which a filter-split preserves EXISTS/IN
    * semantics: Project (row-preserving), SubqueryAlias (transparent),
    * Distinct (EXISTS/IN are value-set operations). Returns the
    * Filter plus a function rebuilding the wrapper stack around a
    * replacement Filter. Anything else (Join, Aggregate, Limit,
    * Window, ...) is out of scope — a split there is not sound in
    * general, so the check rule refuses it instead.
    */
  private def topFilter(
      sub: LogicalPlan): Option[(Filter, LogicalPlan => LogicalPlan)] =
    sub match {
      case p @ Project(_, child) =>
        topFilter(child).map { case (f, rb) =>
          (f, (nf: LogicalPlan) => p.copy(child = rb(nf)))
        }
      case a @ SubqueryAlias(_, child) =>
        topFilter(child).map { case (f, rb) =>
          (f, (nf: LogicalPlan) => a.copy(child = rb(nf)))
        }
      case d @ Distinct(child) =>
        topFilter(child).map { case (f, rb) =>
          (f, (nf: LogicalPlan) => d.copy(child = rb(nf)))
        }
      case f: Filter => Some((f, identity[LogicalPlan] _))
      case _ => None
    }

  /** One subquery plan per conjunctive branch, or None when the
    * condition cannot be soundly expanded within the cap.
    */
  private def rebuildBranches(sub: LogicalPlan): Option[Seq[LogicalPlan]] =
    topFilter(sub).flatMap { case (f, rebuild) =>
      expand(f.condition).map { branches =>
        branches.map(b => rebuild(Filter(b, f.child)))
      }
    }

  /** Distribute the condition into branches such that no OR remains
    * above a correlated reference in any branch — Kleene-exact at
    * every step (OR-split, AND-over-OR distribution, De Morgan and
    * double-negation for NOT all hold under three-valued logic).
    * Uncorrelated sub-trees are never expanded (they are fine where
    * they are, and expanding them would only multiply branches).
    * Returns None past [[maxBranches]] or when the correlated OR is
    * buried inside a non-boolean operator (CASE, COALESCE, a function
    * call), where boolean distribution does not apply.
    */
  private def expand(cond: Expression): Option[Seq[Expression]] = {
    def go(e: Expression): Option[Seq[Expression]] =
      if (!disjunctiveOuter(e)) Some(Seq(e))
      else e match {
        case Or(l, r) =>
          for { ls <- go(l); rs <- go(r) } yield ls ++ rs
        case And(l, r) =>
          for {
            ls <- go(l); rs <- go(r)
            if ls.size.toLong * rs.size <= maxBranches
          } yield for { a <- ls; b <- rs } yield And(a, b)
        case Not(Or(l, r)) => go(And(Not(l), Not(r)))
        case Not(And(l, r)) => go(Or(Not(l), Not(r)))
        case Not(Not(x)) => go(x)
        case _ => None // correlated OR under a non-boolean node
      }
    go(cond).filter(bs => bs.size <= maxBranches)
  }
}

/** Companion check: any disjunctive correlation REMAINING in an
  * EXISTS/IN subquery after [[DisjunctiveCorrelationRewrite]] (out of
  * soundness scope, or past the expansion cap) would crash Spark
  * 4.1.2's decorrelation with an internal error — refuse it at
  * analysis time with a named, actionable message instead.
  * Deliberately scoped to Exists/ListQuery: scalar and lateral
  * subqueries take the DecorrelateInnerQuery path, which plans
  * disjunctive correlation via domain joins.
  */
object DisjunctiveCorrelationCheck extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit =
    plan.foreachWithSubqueries { op =>
      op.expressions.foreach { e =>
        e.foreach {
          case s: Exists => checkSub(s)
          case InSubquery(_, l: ListQuery) => checkSub(l)
          case _ => ()
        }
      }
    }

  private def checkSub(s: SubqueryExpression): Unit =
    s.plan.foreach { node =>
      node.expressions.foreach { e =>
        val bad = e.exists {
          case o: Or => DisjunctiveCorrelationRewrite.outerHere(o)
          case _ => false
        }
        if (bad) throw new AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            ("GRAFT_DISJUNCTIVE_CORRELATION: this EXISTS/IN subquery " +
              "correlates to the outer query under an OR in a position " +
              "graft cannot soundly rewrite (or past the " +
              s"${DisjunctiveCorrelationRewrite.maxBranches}-branch " +
              "expansion cap), and Spark 4.1.2's decorrelation crashes " +
              "on it. Rewrite the subquery as an OR of " +
              "conjunctively-correlated EXISTS/IN branches, or a UNION " +
              s"inside the subquery. Offending predicate: ${e.sql}")))
      }
    }
}
