package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeConstants.MICROS_PER_DAY
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Catalyst optimizer rule: rewrite a pure band (interval) inner join into
  * a binned equi join — the [[graft.operators.Ops.rangeBinJoin]]
  * transformation applied automatically, so ANY band join written naively
  * (`a.x >= b.y - 50 AND a.x < b.y`, or the temporal
  * `o_day BETWEEN date_sub(ship_day, 90) AND ship_day`) plans as one
  * shuffle instead of a nested loop. Without this, Catalyst's only
  * strategies for a non-equi-only join are BroadcastNestedLoopJoin (needs
  * one side in memory) or a cartesian product — both fatal at 100 TB.
  *
  * Fires ONLY when all of the following hold, so it can never pessimize:
  *  - inner join, no join hints (an explicit `broadcast()` is a user
  *    override and wins — q_join_range keeps its intentional BNLJ);
  *  - the condition contains a finite-width band on one deterministic
  *    probe expression: a lower and an upper conjunct whose bounds share
  *    one deterministic base expression from the OTHER side, offset by
  *    foldable literals (`x >= y - 50 AND x < y`,
  *    `x BETWEEN y - 5 AND y + 5`, `d >= date_sub(e, 90) AND d <= e`,
  *    `ts >= e - INTERVAL 3 DAYS AND ts < e`, …);
  *  - probe and base are one of: DOUBLE/FLOAT, any integral, DECIMAL
  *    (numeric bands), DATE (`date_add`/`date_sub`/interval offsets in
  *    whole days), or TIMESTAMP (day-time / calendar-interval offsets);
  *  - no cross-side equality conjunct exists (if one does, Spark already
  *    plans a hash join keyed on it — and this also makes the rule
  *    idempotent: its own output is an equi join, so it never re-fires
  *    after predicate pushdown folds the band back into the join).
  *
  * When several (lower, upper) pairs qualify, the NARROWEST band wins —
  * the tightest bin width prunes the most candidate pairs (wider pairs
  * are implied by the re-filter anyway).
  *
  * The rewrite: probe side projects `bin = floor(units(x) / w)` (w = band
  * width in the type's canonical units: the value itself for numerics,
  * days since epoch for DATE via `unix_date`, microseconds since epoch
  * for TIMESTAMP via `unix_micros` — both monotone, timezone-free
  * mappings); build side explodes
  * `sequence(bin(loExpr), bin(hiExpr))` — the ORIGINAL bound expressions
  * are binned, never reconstructed from base+offset, so the bin range
  * brackets whatever the engine's own date/interval arithmetic produces
  * (calendar quirks can shift a bound; they then shift its bin with it,
  * and the superset property — lo ≤ x ≤ hi ⇒ bin(lo) ≤ bin(x) ≤ bin(hi),
  * by monotonicity of units∘floor — is unconditional). ≤ 2 bins per build
  * row since hi − lo = w. The join becomes `binP = binB`; the ORIGINAL
  * condition is re-applied as a filter above, so correctness never
  * depends on the bin arithmetic, and a final project restores the
  * original output. NULL semantics survive: a NULL probe gets a NULL bin
  * (joins nothing; the original predicate was NULL too), a NULL bound
  * yields a NULL sequence (explode emits nothing; same result for an
  * inner join).
  *
  * Kill switch: `spark.graft.bandJoinRewrite=false` (SQLConf, settable
  * per session or per statement).
  */
object BandJoinToBinEquiJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** A one-sided bound on `probe`: probe ≥/> boundExpr (lower) or
    * probe ≤/< boundExpr (upper), where boundExpr = base ⊕ offset and
    * `offsetUnits` is the offset in the type family's canonical units
    * (used only to find matching pairs and size the bin width — binning
    * itself uses `boundExpr` verbatim).
    */
  private final case class Bound(probe: Expression, base: Expression,
      offsetUnits: Double, boundExpr: Expression, isLower: Boolean)

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
    // candidate (lower, upper) pairs on the same probe expr with the same
    // base, NARROWEST first (ADVICE r7: a wide pair must not shadow a
    // tight one — bin pruning scales with 1/width). Pairing compares
    // MODULO exact numeric widening casts: type promotion routinely puts
    // the two conjuncts of one band in different domains (`x >= y - 0.25`
    // promotes DECIMAL x,y to DOUBLE while `x < y` stays DECIMAL), so the
    // probe appears as both `cast(x as double)` and `x`. Stripping is
    // sound because pairing is all it affects — each bound still BINS its
    // own original expression in its own domain, where its own monotone
    // units map preserves the superset bracket, and the stripped chains
    // are value-exact so both probe spellings bin to the same value.
    def strip(e: Expression): Expression = stripExactWidenings(e)
    val pairs = (for {
      lo <- bounds if lo.isLower
      hi <- bounds if !hi.isLower
      if strip(lo.probe).semanticEquals(strip(hi.probe)) &&
        strip(lo.base).semanticEquals(strip(hi.base))
      if hi.offsetUnits - lo.offsetUnits > 0 &&
        java.lang.Double.isFinite(hi.offsetUnits - lo.offsetUnits)
    } yield (lo, hi)).sortBy { case (lo, hi) => hi.offsetUnits - lo.offsetUnits }

    // first pair (narrowest) that orients: probe from one side, base
    // referencing only the other
    pairs.iterator.flatMap { case (lo, hi) =>
      val width = hi.offsetUnits - lo.offsetUnits
      val sides = Seq((left, right, false), (right, left, true))
      sides.collectFirst {
        case (probeSide, buildSide, swapped)
            if lo.probe.references.nonEmpty &&
              lo.probe.references.subsetOf(probeSide.outputSet) &&
              lo.probe.deterministic &&
              hi.base.references.nonEmpty &&
              hi.base.references.subsetOf(buildSide.outputSet) &&
              lo.boundExpr.deterministic && hi.boundExpr.deterministic =>
          build(j, probeSide, buildSide, swapped, lo.probe,
            lo.boundExpr, hi.boundExpr, width, cond)
      }
    }.take(1).toSeq.headOption
  }

  private def crossSide(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  /** Any foldable numeric literal → its double value (the pair search and
    * width arithmetic run in double; binning never uses this value, so
    * precision loss on an extreme literal only mis-sizes the width).
    */
  private object NumLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, dt) => dt match {
        case DoubleType => Some(v.asInstanceOf[Double])
        case FloatType => Some(v.asInstanceOf[Float].toDouble)
        case IntegerType => Some(v.asInstanceOf[Int].toDouble)
        case LongType => Some(v.asInstanceOf[Long].toDouble)
        case ShortType => Some(v.asInstanceOf[Short].toDouble)
        case ByteType => Some(v.asInstanceOf[Byte].toDouble)
        case _: DecimalType => Some(v.asInstanceOf[Decimal].toDouble)
        case _ => None
      }
      case _ => None
    }
  }

  /** A constant day-time offset in MICROSECONDS: a DayTimeIntervalType
    * literal, or a CalendarInterval literal with no (variable-length)
    * month component.
    */
  private object TsOffsetLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(us: Long, _: DayTimeIntervalType) => Some(us.toDouble)
      case Literal(ci: CalendarInterval, CalendarIntervalType) if ci.months == 0 =>
        Some(ci.days.toDouble * MICROS_PER_DAY + ci.microseconds)
      case _ => None
    }
  }

  /** A constant whole-day offset for DATE arithmetic (in DAYS). */
  private object DayOffsetLit {
    def unapply(e: Expression): Option[Double] = e match {
      case NumLit(k) => Some(k)
      case Literal(ci: CalendarInterval, CalendarIntervalType)
          if ci.months == 0 && ci.microseconds == 0 => Some(ci.days.toDouble)
      case _ => None
    }
  }

  /** Supported band column families, keyed by the comparison's data type.
    * Each family defines the canonical-units offsets its `decomp` reads.
    */
  private def familySupported(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | IntegerType | LongType | ShortType |
        ByteType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** boundExpr → (base, offset in canonical units). The base is what the
    * pair search matches across the lower and upper conjuncts; the offset
    * difference is the band width.
    */
  private def decomp(x: Expression): Option[(Expression, Double)] = x.dataType match {
    case DateType => x match {
      case DateAdd(b, DayOffsetLit(k)) => Some((b, k))
      case DateSub(b, DayOffsetLit(k)) => Some((b, -k))
      case DateAddInterval(b, DayOffsetLit(k), _, _) => Some((b, k))
      case b => Some((b, 0.0))
    }
    case TimestampType | TimestampNTZType => x match {
      case TimestampAddInterval(b, TsOffsetLit(us), _) => Some((b, us))
      case b => Some((b, 0.0))
    }
    case _ => x match { // numeric families: value itself is the unit
      case Add(b, NumLit(k), _) => Some((b, k))
      case Add(NumLit(k), b, _) => Some((b, k))
      case Subtract(b, NumLit(k), _) => Some((b, -k))
      case b => Some((b, 0.0))
    }
  }

  /** cmp → every Bound reading of it. Both operand orders are covered by
    * emitting BOTH interpretations (`x >= y` is a lower bound on x AND an
    * upper bound on y — the pair search decides which reading completes a
    * band). The probe may be any deterministic single-side expression (a
    * bare column, `to_date(ts)`, a widening cast): the bin superset
    * property is over the comparison OPERAND's value, so no monotonicity
    * of the probe expression itself is ever needed.
    */
  private def asBounds(e: Expression): Seq[Bound] = {
    def mk(p: Expression, b: Expression, isLower: Boolean): Seq[Bound] =
      if (familySupported(p.dataType) && b.dataType == p.dataType)
        decomp(b).map { case (base, k) => Bound(p, base, k, b, isLower) }.toSeq
      else Nil
    e match {
      // a cmp b: read as a bound on the left expr AND (mirrored) on the right
      case GreaterThanOrEqual(p, b) => mk(p, b, isLower = true) ++ mk(b, p, isLower = false)
      case GreaterThan(p, b) => mk(p, b, isLower = true) ++ mk(b, p, isLower = false)
      case LessThanOrEqual(p, b) => mk(p, b, isLower = false) ++ mk(b, p, isLower = true)
      case LessThan(p, b) => mk(p, b, isLower = false) ++ mk(b, p, isLower = true)
      case _ => Nil
    }
  }

  /** Strips casts that are value-exact numeric widenings (or that `units`
    * would apply anyway), so two spellings of one band column produced by
    * type promotion compare equal during pair search.
    */
  @annotation.tailrec
  private def stripExactWidenings(e: Expression): Expression = e match {
    case c: Cast if isExactWidening(c.child.dataType, c.dataType) =>
      stripExactWidenings(c.child)
    case other => other
  }

  private def isExactWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    // numeric → double: units() itself funnels every numeric through a
    // cast to double, so both spellings bin to the identical value even
    // where the cast rounds (long/decimal beyond 2^53 — same rounding)
    case (_: NumericType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case (ByteType, t: DecimalType) => t.precision - t.scale >= 3
    case (ShortType, t: DecimalType) => t.precision - t.scale >= 5
    case (IntegerType, t: DecimalType) => t.precision - t.scale >= 10
    case (LongType, t: DecimalType) => t.precision - t.scale >= 19
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Canonical-units projection of a band-typed expression: a monotone,
    * timezone-free map to a numeric domain the binning divides. DATE →
    * days since epoch (`unix_date`), TIMESTAMP → microseconds since epoch
    * (`unix_micros`), everything numeric → itself widened to double
    * (monotone even where lossy — bins only need order, and the original
    * predicate re-filters above the join).
    */
  private def units(x: Expression): Expression = x.dataType match {
    case DoubleType => x
    case DateType => Cast(UnixDate(x), DoubleType)
    case TimestampType => Cast(UnixMicros(x), DoubleType)
    // NTZ: interpret in the session zone, then micros. localtime→instant is
    // monotone NON-DECREASING even across DST gaps/overlaps (java.time
    // resolves a gap forward and an overlap to one consistent offset), and
    // non-strict monotonicity is all the bin-superset property needs.
    case TimestampNTZType =>
      Cast(UnixMicros(Cast(x, TimestampType, Some(conf.sessionLocalTimeZone))), DoubleType)
    case _ => Cast(x, DoubleType)
  }

  private def build(j: Join, probeSide: LogicalPlan, buildSide: LogicalPlan,
      swapped: Boolean, probe: Expression, loExpr: Expression,
      hiExpr: Expression, width: Double, origCond: Expression): LogicalPlan = {
    val w = Literal(width, DoubleType)
    def bin(x: Expression): Expression = Cast(Floor(Divide(units(x), w)), LongType)

    val u = java.util.UUID.randomUUID().toString.take(8)
    val pAlias = Alias(bin(probe), s"__graft_binp_$u")()
    val probePlan = Project(probeSide.output :+ pAlias, probeSide)

    // explicit timeZoneId: Sequence is TimeZoneAwareExpression and the
    // analyzer's ResolveTimeZone has already run — without it the node
    // stays unresolved and plan validation rejects the rewrite
    val seq = Sequence(bin(loExpr), bin(hiExpr), None, Some(conf.sessionLocalTimeZone))
    val bAttr = AttributeReference(s"__graft_binb_$u", LongType, nullable = false)()
    val buildPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bAttr), buildSide)

    val (l, r) = if (swapped) (buildPlan, probePlan) else (probePlan, buildPlan)
    val binJoin = Join(l, r, Inner,
      Some(EqualTo(pAlias.toAttribute, bAttr)), JoinHint.NONE)
    Project(j.output, Filter(origCond, binJoin))
  }
}
