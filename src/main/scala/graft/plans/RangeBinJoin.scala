package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a PURE range join (no equi keys, a
  * bounded band `lo ≤ x − y ≤ hi` between long columns of the two sides)
  * into the binned equi-join — the rewrite `q_range_join_binned` performs
  * by hand, applied automatically so users can write the natural
  * predicate.
  *
  * Why: Spark plans a no-equi-key inner join as BroadcastNestedLoopJoin
  * (or a cartesian product) — O(|L|·|R|) comparisons, the first thing
  * that dies at scale. With a bounded band the classic fix is to quantize
  * both sides into bins of width = band span: every matching pair is then
  * at most ONE bin apart, so equi-joining on the bin key (probe side
  * exploded to its ≤ 2 covering bins) finds all candidates and the
  * original predicate re-filters exactly. The join becomes a shuffled
  * hash/sort-merge join keyed on the bin — linear data movement.
  *
  * Scope (deliberately narrow, semantics-preserving by construction):
  *   - Inner joins whose condition has NO equality conjunct between the
  *     sides (those already hash-partition; binning would add nothing)
  *   - band conjuncts are comparisons between `attr [± literal]` linear
  *     forms, both attributes LongType, one from each side
  *   - both a lower and an upper bound must exist (a one-sided band has
  *     unbounded reach — nothing to bin)
  *   - the ORIGINAL condition is kept verbatim on the rewritten join, so
  *     the rewrite can only equal the unrewritten result
  *   - bin arithmetic uses Pmod-based floor division (exact for the full
  *     long domain — a double `floor(x/w)` would lose precision past 2⁵³)
  *
  * Idempotent: the rewritten join HAS an equality conjunct (the bin key),
  * so the no-equi guard stops a second application. Disable with
  * `spark.graft.rangeBinJoin.enabled=false`.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.rangeBinJoin.enabled"

  /** `attr ± literal` as (attr, offset). */
  private def linear(e: Expression): Option[(Attribute, Long)] = e match {
    case a: Attribute if a.dataType == LongType => Some((a, 0L))
    case Add(a: Attribute, Literal(v, LongType), _) => Some((a, v.asInstanceOf[Long]))
    case Add(Literal(v, LongType), a: Attribute, _) => Some((a, v.asInstanceOf[Long]))
    case Subtract(a: Attribute, Literal(v, LongType), _) => Some((a, -v.asInstanceOf[Long]))
    case Cast(c, LongType, _, _) => linear(c)
    case _ => None
  }

  /** A conjunct as an UPPER bound `x − y ≤ k` (lower bounds surface as
    * upper bounds of the mirrored pair; orientation happens at the join). */
  private def asUpper(c: Expression): Option[(Attribute, Attribute, Long)] = {
    def norm(l: Expression, r: Expression, strictBy: Long) =
      for ((xa, xo) <- linear(l); (ya, yo) <- linear(r))
        // l ≤ r  ⇔  x + xo ≤ y + yo  ⇔  x − y ≤ yo − xo
        yield (xa, ya, yo - xo - strictBy)
    c match {
      case LessThanOrEqual(l, r)    => norm(l, r, 0L)
      case LessThan(l, r)           => norm(l, r, 1L)
      case GreaterThanOrEqual(l, r) => norm(r, l, 0L)
      case GreaterThan(l, r)        => norm(r, l, 1L)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && shouldRewrite(j) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def shouldRewrite(j: Join): Boolean = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // no cross-side equality conjunct (incl. null-safe) may exist
    !conjuncts.exists {
      case EqualTo(l, r) => crossSide(j, l, r)
      case EqualNullSafe(l, r) => crossSide(j, l, r)
      case _ => false
    }
  }

  private def crossSide(j: Join, l: Expression, r: Expression): Boolean = {
    val (lr, rr) = (l.references, r.references)
    lr.nonEmpty && rr.nonEmpty &&
      ((lr.subsetOf(j.left.outputSet) && rr.subsetOf(j.right.outputSet)) ||
        (lr.subsetOf(j.right.outputSet) && rr.subsetOf(j.left.outputSet)))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // collect bounds on (x − y) for a single (x, y) attribute pair with
    // x on one side and y on the other
    var pair: Option[(Attribute, Attribute)] = None
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    conjuncts.foreach { c =>
      asUpper(c).foreach { case (xa, ya, k) =>
        // orient so x ∈ left, y ∈ right: an upper bound on the mirrored
        // pair (x' ∈ right) is a LOWER bound −k on the oriented one
        if (left.outputSet.contains(xa) && right.outputSet.contains(ya)) {
          if (pair.forall(_ == ((xa, ya)))) {
            pair = Some((xa, ya))
            hi = Some(hi.fold(k)(math.min(_, k)))
          }
        } else if (left.outputSet.contains(ya) && right.outputSet.contains(xa)) {
          if (pair.forall(_ == ((ya, xa)))) {
            pair = Some((ya, xa))
            lo = Some(lo.fold(-k)(math.max(_, -k)))
          }
        }
      }
    }
    (pair, lo, hi) match {
      case (Some((x, y)), Some(l), Some(h)) if h >= l =>
        val w = h - l + 1
        def floorDiv(e: Expression): Expression =
          IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))
        val binL = Alias(floorDiv(x), "graft_bin")()
        val leftP = Project(left.output :+ binL, left)
        val binLo = floorDiv(Add(y, Literal(l)))
        val binHi = floorDiv(Add(y, Literal(h)))
        val gen = Explode(ArrayDistinct(CreateArray(Seq(binLo, binHi))))
        val binR = AttributeReference("graft_bin_probe", LongType, nullable = false)()
        val rightG = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(binR), child = right)
        val newCond = And(EqualTo(binL.toAttribute, binR), cond)
        // project the bin columns back OUT so the rewrite is output-invisible
        Some(Project(j.output,
          Join(leftP, rightG, Inner, Some(newCond), hint)))
      case _ => None
    }
  }
}
