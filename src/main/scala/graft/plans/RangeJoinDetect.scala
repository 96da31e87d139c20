package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Optimizer-side detection of the interval-join shape: an INNER join
  * whose condition is exactly
  *
  *   leftKey = rightKey  AND  on ≳ lo  AND  on ≲ hi
  *
  * with `on` an attribute of one side, `lo`/`hi` arbitrary expressions
  * over the other, and EVERY endpoint convention accepted — `>`/`>=`
  * on the lower bound × `<`/`<=` on the upper, commuted spellings
  * included. The inclusivity of each endpoint maps onto
  * [[RangeJoinExec]]'s `loInclusive`/`hiInclusive` flags, so `(lo,hi]`
  * (q37's convention), `[lo,hi)` (how most users write "within the
  * hour"), and both closed/open variants all reach the same O(n+m)
  * merge. Spark's JoinSelection would plan each of them as a hash join
  * on the key that post-filters the bounds — every same-key pair
  * materializes, E² per hot key — so this strategy intercepts the
  * shape FIRST. The user writes the ordinary composable spelling and
  * still gets the time-series plan; the explicit [[RangeJoin.range]]
  * API remains for the left-outer variant.
  *
  * Bails (returns Nil → built-in strategies take over) on: streaming
  * children (the exec is a batch operator; stream-stream joins need
  * Spark's symmetric-hash state), join hints, more than one equi
  * pair, leftover conjuncts, bounds/on not cleanly split across the
  * two sides — and on a broadcast-tiny side: under
  * `autoBroadcastJoinThreshold` the built-in BroadcastHashJoin +
  * filter beats two exchanges + two sorts + merge, so small inputs
  * keep the cheap plan and the merge takes over exactly where the
  * pair blow-up starts to matter.
  */
object RangeJoinAutoStrategy extends SparkStrategy with PredicateHelper {

  /** Detection result: the equi key on the bounds side, the equi key
    * on the `on` side, the bound expressions with their inclusivity,
    * the `on` attribute, and whether the bounds side is the logical
    * join's RIGHT child.
    */
  private final case class Detected(
      boundsKey: Attribute, onKey: Attribute,
      lo: Expression, hi: Expression, on: Attribute,
      swapped: Boolean, loInclusive: Boolean, hiInclusive: Boolean)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          !left.isStreaming && !right.isStreaming &&
          !broadcastTiny(left, right) =>
      detect(left, right, cond) match {
        case Some(d) =>
          val (bl, br) = if (d.swapped) (right, left) else (left, right)
          val exec = RangeJoinExec(planLater(bl), planLater(br),
            d.lo, d.hi, d.boundsKey, d.onKey, d.on,
            bl.output ++ br.output.map(_.withNullability(true)),
            d.loInclusive, d.hiInclusive)
          // inner semantics: drop the exec's null-extended unmatched
          // rows — matched rows always carry a non-null `on` (they
          // passed the bounds)
          val inner = FilterExec(
            IsNotNull(d.on.withNullability(true)), exec)
          // restore the logical Join's column order when the range
          // sides are swapped relative to the join's left/right
          if (d.swapped)
            ProjectExec(
              j.output.map(a => exec.output.find(_.exprId == a.exprId).get),
              inner) :: Nil
          else inner :: Nil
        case None => Nil
      }
    // the LEFT-OUTER spelling maps onto the exec DIRECTLY (it IS a
    // left-outer merge): unmatched lefts null-extend, exactly SQL's
    // left-join semantics. Only the unswapped orientation applies —
    // the outer side must be the bounds side.
    case Join(left, right, LeftOuter, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          !left.isStreaming && !right.isStreaming &&
          !broadcastTiny(left, right) =>
      detect(left, right, cond) match {
        case Some(d) if !d.swapped =>
          RangeJoinExec(planLater(left), planLater(right),
            d.lo, d.hi, d.boundsKey, d.onKey, d.on,
            left.output ++ right.output.map(_.withNullability(true)),
            d.loInclusive, d.hiInclusive) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** True when either side's estimated size fits under the session's
    * autoBroadcastJoinThreshold (> 0; −1 disables broadcasting, and
    * then the merge is the right plan at every size).
    */
  private def broadcastTiny(left: LogicalPlan, right: LogicalPlan): Boolean = {
    val thr = SQLConf.get.autoBroadcastJoinThreshold
    thr > 0 && (left.stats.sizeInBytes <= thr || right.stats.sizeInBytes <= thr)
  }

  private def detect(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[Detected] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 3) return None
    val leftSet = left.outputSet
    val rightSet = right.outputSet
    def sideOf(e: Expression): Option[Boolean] = // Some(true) = left
      if (e.references.nonEmpty && e.references.subsetOf(leftSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(rightSet))
        Some(false)
      else None

    // split into the one equi conjunct and the two comparisons, each
    // comparison normalized to `a < b` / `a <= b` (commuted `>`/`>=`
    // spellings flip operands)
    var equi: Option[(Attribute, Attribute)] = None // (left, right)
    val cmps = Seq.newBuilder[(Expression, Expression, Boolean)]
    for (c <- conjuncts) c match {
      case EqualTo(a: Attribute, b: Attribute) if equi.isEmpty =>
        (sideOf(a), sideOf(b)) match {
          case (Some(true), Some(false)) => equi = Some((a, b))
          case (Some(false), Some(true)) => equi = Some((b, a))
          case _ => return None
        }
      case LessThan(a, b) => cmps += ((a, b, false))
      case LessThanOrEqual(a, b) => cmps += ((a, b, true))
      case GreaterThan(a, b) => cmps += ((b, a, false))
      case GreaterThanOrEqual(a, b) => cmps += ((b, a, true))
      case _ => return None
    }
    val (lk, rk) = equi.getOrElse(return None)
    val two = cmps.result()
    if (two.size != 2) return None

    // each normalized `a OP b` admits up to two readings — `a` is the
    // `on` attribute (upper bound b) or `b` is (lower bound a); a
    // reading is valid when `on` is an Attribute and the bound sits
    // wholly on the opposite side. (isLower, bound, on, onSide, incl)
    def readings(a: Expression, b: Expression, incl: Boolean)
        : Seq[(Boolean, Expression, Attribute, Boolean, Boolean)] = {
      val asUpper = a match {
        case attr: Attribute => (sideOf(attr), sideOf(b)) match {
          case (Some(os), Some(bs)) if os != bs =>
            Seq((false, b, attr, os, incl))
          case _ => Nil
        }
        case _ => Nil
      }
      val asLower = b match {
        case attr: Attribute => (sideOf(attr), sideOf(a)) match {
          case (Some(os), Some(bs)) if os != bs =>
            Seq((true, a, attr, os, incl))
          case _ => Nil
        }
        case _ => Nil
      }
      asUpper ++ asLower
    }
    val Seq((a1, b1, i1), (a2, b2, i2)) = two
    val consistent = for {
      x <- readings(a1, b1, i1)
      y <- readings(a2, b2, i2)
      if x._1 != y._1 // one lower, one upper
      lo = if (x._1) x else y
      hi = if (x._1) y else x
      if lo._3.semanticEquals(hi._3) && lo._4 == hi._4 // same on, same side
    } yield (lo, hi)
    consistent.headOption.map {
      case ((_, loE, on, onSide, loIncl), (_, hiE, _, _, hiIncl)) =>
        if (!onSide) Detected(lk, rk, loE, hiE, on,
          swapped = false, loIncl, hiIncl) // on right, bounds left
        else Detected(rk, lk, loE, hiE, on,
          swapped = true, loIncl, hiIncl) // on left, bounds right: swap
    }
  }
}
