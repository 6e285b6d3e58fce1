package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: rewrite a pure band (interval) inner join into
  * a binned equi join — the [[graft.operators.Ops.rangeBinJoin]]
  * transformation applied automatically, so ANY band join written naively
  * (`a.x >= b.y - 50 AND a.x < b.y`) plans as one shuffle instead of a
  * nested loop. Without this, Catalyst's only strategies for a
  * non-equi-only join are BroadcastNestedLoopJoin (needs one side in
  * memory) or a cartesian product — both fatal at 100 TB.
  *
  * Fires ONLY when all of the following hold, so it can never pessimize:
  *  - inner join, no join hints (an explicit `broadcast()` is a user
  *    override and wins — q_join_range keeps its intentional BNLJ);
  *  - the condition contains a finite-width band on one probe attribute:
  *    a lower and an upper conjunct whose bounds share one deterministic
  *    base expression from the OTHER side, offset by foldable numeric
  *    literals (`x >= y - 50 AND x < y`, `x BETWEEN y - 5 AND y + 5`, …);
  *  - probe and base are DOUBLE-typed (the corpus's band columns; other
  *    numerics can be widened later);
  *  - no cross-side equality conjunct exists (if one does, Spark already
  *    plans a hash join keyed on it — and this also makes the rule
  *    idempotent: its own output is an equi join, so it never re-fires
  *    after predicate pushdown folds the band back into the join).
  *
  * The rewrite: probe side projects `bin = floor(x / w)` (w = band width);
  * build side explodes `sequence(floor(lo/w), floor(hi/w))` — ≤ 2 bins per
  * row since hi − lo = w; join becomes `binP = binB`; the ORIGINAL
  * condition is re-applied as a filter above (bins are a pure superset by
  * floor's monotonicity: lo ≤ x ≤ hi ⇒ floor(lo/w) ≤ floor(x/w) ≤
  * floor(hi/w) — so correctness never depends on the bin arithmetic), and
  * a final project restores the original output. NULL semantics survive:
  * a NULL probe gets a NULL bin (joins nothing; the original predicate was
  * NULL too), a NULL bound yields a NULL sequence (explode emits nothing;
  * same result for an inner join).
  *
  * Kill switch: `spark.graft.bandJoinRewrite=false` (SQLConf, settable
  * per session or per statement).
  */
object BandJoinToBinEquiJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** A one-sided bound on `probe`: probe ≥/> base + offset (lower) or
    * probe ≤/< base + offset (upper).
    */
  private final case class Bound(probe: AttributeReference, base: Expression,
      offset: Double, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // lenient parse — throwing from inside the optimizer would fail every
    // query in the session. Only known-truthy spellings enable; anything
    // unrecognized ("disabled", "n", a typo) disables WITH a warning, so a
    // user reaching for the kill switch always gets the rule off.
    val flag = conf.getConfString("spark.graft.bandJoinRewrite", "true").trim.toLowerCase
    val enabled = flag match {
      case "true" | "1" | "on" | "yes" => true
      case "false" | "0" | "off" | "no" => false
      case other =>
        logWarning(s"unrecognized spark.graft.bandJoinRewrite value '$other' — disabling the rewrite")
        false
    }
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE && j.resolved =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // bail if anything already equi-joins the two sides
    val hasCrossEquality = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }
    if (hasCrossEquality) return None

    val bounds = conjuncts.flatMap(asBounds)
    // find a (lower, upper) pair on the same probe attr with the same base
    val pair = (for {
      lo <- bounds if lo.isLower
      hi <- bounds if !hi.isLower
      if lo.probe.semanticEquals(hi.probe) && lo.base.semanticEquals(hi.base)
      if hi.offset - lo.offset > 0 && java.lang.Double.isFinite(hi.offset - lo.offset)
    } yield (lo, hi)).headOption

    pair.flatMap { case (lo, hi) =>
      val width = hi.offset - lo.offset
      // orient: probe attr from one side, base referencing only the other
      val sides = Seq((left, right, false), (right, left, true))
      sides.collectFirst {
        case (probeSide, buildSide, swapped)
            if lo.probe.references.subsetOf(probeSide.outputSet) &&
              hi.base.references.nonEmpty &&
              hi.base.references.subsetOf(buildSide.outputSet) &&
              hi.base.deterministic =>
          build(j, probeSide, buildSide, swapped, lo.probe, lo.base,
            lo.offset, hi.offset, width, cond)
      }
    }
  }

  private def crossSide(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  /** cmp → every Bound reading of it. Both operand orders are covered by
    * emitting BOTH interpretations when both sides qualify (`x >= y` is a
    * lower bound on x AND an upper bound on y — the pair search decides
    * which reading completes a band). Doubles only (see object doc);
    * `base + offset` decomposition covers base ± literal and bare base.
    */
  private def asBounds(e: Expression): Seq[Bound] = {
    def decomp(x: Expression): Option[(Expression, Double)] = x match {
      case Add(b, Literal(k, DoubleType), _) => Some((b, k.asInstanceOf[Double]))
      case Add(Literal(k, DoubleType), b, _) => Some((b, k.asInstanceOf[Double]))
      case Subtract(b, Literal(k, DoubleType), _) => Some((b, -k.asInstanceOf[Double]))
      case b => Some((b, 0.0))
    }
    def mk(p: Expression, b: Expression, isLower: Boolean): Seq[Bound] = p match {
      case attr: AttributeReference if attr.dataType == DoubleType && b.dataType == DoubleType =>
        decomp(b).map { case (base, k) => Bound(attr, base, k, isLower) }.toSeq
      case _ => Nil
    }
    e match {
      // a cmp b: read as a bound on the left attr AND (mirrored) on the right
      case GreaterThanOrEqual(p, b) => mk(p, b, isLower = true) ++ mk(b, p, isLower = false)
      case GreaterThan(p, b) => mk(p, b, isLower = true) ++ mk(b, p, isLower = false)
      case LessThanOrEqual(p, b) => mk(p, b, isLower = false) ++ mk(b, p, isLower = true)
      case LessThan(p, b) => mk(p, b, isLower = false) ++ mk(b, p, isLower = true)
      case _ => Nil
    }
  }

  private def build(j: Join, probeSide: LogicalPlan, buildSide: LogicalPlan,
      swapped: Boolean, probe: AttributeReference, base: Expression,
      loOff: Double, hiOff: Double, width: Double,
      origCond: Expression): LogicalPlan = {
    val w = Literal(width, DoubleType)
    def bin(x: Expression): Expression = Cast(Floor(Divide(x, w)), LongType)

    val u = java.util.UUID.randomUUID().toString.take(8)
    val pAlias = Alias(bin(probe), s"__graft_binp_$u")()
    val probePlan = Project(probeSide.output :+ pAlias, probeSide)

    val lo = Add(base, Literal(loOff, DoubleType))
    val hi = Add(base, Literal(hiOff, DoubleType))
    // explicit timeZoneId: Sequence is TimeZoneAwareExpression and the
    // analyzer's ResolveTimeZone has already run — without it the node
    // stays unresolved and plan validation rejects the rewrite
    val seq = Sequence(bin(lo), bin(hi), None, Some(conf.sessionLocalTimeZone))
    val bAttr = AttributeReference(s"__graft_binb_$u", LongType, nullable = false)()
    val buildPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bAttr), buildSide)

    val (l, r) = if (swapped) (buildPlan, probePlan) else (probePlan, buildPlan)
    val binJoin = Join(l, r, Inner,
      Some(EqualTo(pAlias.toAttribute, bAttr)), JoinHint.NONE)
    Project(j.output, Filter(origCond, binJoin))
  }
}
