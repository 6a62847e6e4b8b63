package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (rung (c) of the custom-op ladder): rewrite a naive
  * range-containment join — `p.ts >= i.lo AND p.ts < i.hi` with NO
  * equi-key — into the bin-bucketed equi-join of
  * [[graft.ops.IntervalJoin]]. Catalyst plans the naive form as a
  * BroadcastNestedLoopJoin, which goes quadratic the moment the
  * interval side outgrows the broadcast threshold; the rewrite makes
  * it a hash join on `ts DIV bin`, with the exact range predicate kept
  * as the join residual. Correct for any bin size because truncating
  * division is monotone: lo <= ts <= hi-1 implies
  * lo DIV b <= ts DIV b <= (hi-1) DIV b, so a containing interval
  * always lands in the point's bin (see IntervalJoinPropertySpec for
  * the randomized equivalence, including negative epochs).
  *
  * OPT-IN: inert until `graft.rules.intervalJoin.binUs` is set to a
  * positive bin width (same unit as the join columns). Pick it near
  * the typical interval length — the interval side is replicated
  * ~length/bin + 1 times. Scope is deliberately tight: INNER joins,
  * long-typed columns, both bounds on the same point attribute against
  * the opposite side, no other predicates in the condition, batch
  * plans only. The rewritten join contains an equality, so the rule
  * never re-fires on its own output.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`
  * (builder path) or `spark.experimental.extraOptimizations`
  * (live-session path).
  */
object RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  // a malformed conf value (e.g. "2h") must DISABLE the rule, not
  // throw inside the optimizer — that would poison every query in the
  // session, the worst possible blast radius for a tuning knob
  private def binUs: Long =
    scala.util.Try(
      conf.getConfString("graft.rules.intervalJoin.binUs", "0").toLong
    ).getOrElse(0L)

  /** Per-interval bin-count ceiling (fail-loud guard on the Sequence
    * expansion); malformed → the default, never a throw in the
    * optimizer.
    */
  private def maxBinsPerRow: Long =
    scala.util.Try(
      conf.getConfString("graft.rules.intervalJoin.maxBinsPerRow",
        "1000000").toLong
    ).getOrElse(1000000L)

  /** (point ts, lower bound, upper bound, upper is exclusive) when the
    * condition is exactly a two-sided long range with no equi part.
    * A `p >= lo` predicate is syntactically also a reversed closed
    * upper bound (`lo <= p`), so the two conjuncts are tried in BOTH
    * (lower, upper) assignments and the point attribute must agree.
    */
  private def asRange(cond: Expression)
      : Option[(Attribute, Attribute, Attribute, Boolean)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.dataType == LongType => Some(a)
      case _ => None
    }
    def lowerOf(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(p, lo) => for (a <- attr(p); b <- attr(lo)) yield (a, b)
      case LessThanOrEqual(lo, p) => for (a <- attr(p); b <- attr(lo)) yield (a, b)
      case _ => None
    }
    def upperOf(e: Expression): Option[(Attribute, Attribute, Boolean)] = e match {
      case LessThan(p, hi) => for (a <- attr(p); b <- attr(hi)) yield (a, b, true)
      case GreaterThan(hi, p) => for (a <- attr(p); b <- attr(hi)) yield (a, b, true)
      case LessThanOrEqual(p, hi) => for (a <- attr(p); b <- attr(hi)) yield (a, b, false)
      case GreaterThanOrEqual(hi, p) => for (a <- attr(p); b <- attr(hi)) yield (a, b, false)
      case _ => None
    }
    splitConjunctivePredicates(cond) match {
      case Seq(x, y) =>
        Seq((x, y), (y, x)).flatMap { case (l, u) =>
          for {
            (p1, lo) <- lowerOf(l)
            (p2, hi, excl) <- upperOf(u)
            if p1.semanticEquals(p2) && !p1.semanticEquals(lo) &&
              !p1.semanticEquals(hi)
          } yield (p1, lo, hi, excl)
        }.headOption
      case _ => None
    }
  }

  private def div(e: Expression, b: Long): Expression =
    IntegralDivide(e, Literal(b))

  def apply(plan: LogicalPlan): LogicalPlan = {
    val b = binUs
    if (b <= 0) return plan
    plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming =>
        asRange(cond) match {
          case Some((p, lo, hi, upperExclusive))
              if left.outputSet.contains(p) &&
                right.outputSet.contains(lo) &&
                right.outputSet.contains(hi) =>
            // half-open last bin: (hi-1) DIV b; closed upper: hi DIV b
            val hiBinSrc =
              if (upperExclusive) Subtract(hi, Literal(1L)) else hi
            val binL = Alias(div(p, b), "_graft_bin")()
            val binR = AttributeReference("_graft_bin_r", LongType)()
            // bound the per-interval expansion: ONE outlier-long
            // interval at a too-fine binUs would explode into millions
            // of bin rows (Sequence allocates the whole array) and
            // fail or OOM a query the un-rewritten BNLJ completed.
            // Past the cap, fail LOUDLY naming the knobs instead of
            // letting the array allocation be the error message.
            val cap = maxBinsPerRow
            val loBin = div(lo, b)
            val hiBin = div(hiBinSrc, b)
            val guardedHi = If(
              LessThanOrEqual(Subtract(hiBin, loBin), Literal(cap)),
              hiBin,
              Cast(RaiseError(Literal(
                s"range-bin join: an interval spans more than $cap " +
                  s"bins at graft.rules.intervalJoin.binUs=$b — raise " +
                  "binUs (or set it to 0 to disable the rewrite), or " +
                  "raise graft.rules.intervalJoin.maxBinsPerRow")),
                LongType))
            // Sequence is TimeZoneAware: past analysis nothing runs
            // ResolveTimeZone, so the tz must be supplied here or the
            // expression stays unresolved
            val gen = Generate(
              Explode(Sequence(loBin, guardedHi, None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binR),
              child = Filter(
                if (upperExclusive) GreaterThan(hi, lo)
                else GreaterThanOrEqual(hi, lo), right))
            val newLeft = Project(left.output :+ binL, left)
            val joined = Join(newLeft, gen, Inner,
              Some(And(EqualTo(binL.toAttribute, binR), cond)), hint)
            Project(j.output, joined)
          case _ => j
        }
    }
  }
}
