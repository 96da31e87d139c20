package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, SparkStrategy}

/** Optimizer-side detection of the interval-join shape: an INNER join
  * whose condition is exactly
  *
  *   leftKey = rightKey  AND  on > lo  AND  on <= hi
  *
  * with `on` an attribute of one side and `lo`/`hi` arbitrary
  * expressions over the other (commuted comparison spellings
  * included). Spark's JoinSelection plans this as a hash join on the
  * key that post-filters the bounds — every same-key pair
  * materializes, E² per hot key — so this strategy intercepts the
  * shape FIRST and plans the O(n+m) [[RangeJoinExec]] merge instead,
  * with an IsNotNull(on) filter restoring inner semantics over the
  * exec's left-outer output. The user writes the ordinary composable
  * spelling and still gets the time-series plan; the explicit
  * [[RangeJoin.range]] API remains for the left-outer variant.
  *
  * Bails (returns Nil → built-in strategies take over) on: streaming
  * children (the exec is a batch operator; stream-stream joins need
  * Spark's symmetric-hash state), join hints, more than one equi
  * pair, leftover conjuncts, or bounds/on not cleanly split across
  * the two sides.
  */
object RangeJoinAutoStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          !left.isStreaming && !right.isStreaming =>
      detect(left, right, cond) match {
        case Some((boundsKey, onKey, lo, hi, on, swapped)) =>
          val (bl, br) = if (swapped) (right, left) else (left, right)
          val exec = RangeJoinExec(planLater(bl), planLater(br),
            lo, hi, boundsKey, onKey, on,
            bl.output ++ br.output.map(_.withNullability(true)))
          // inner semantics: drop the exec's null-extended unmatched
          // rows — matched rows always carry a non-null `on` (they
          // passed the bounds)
          val inner = FilterExec(
            IsNotNull(on.withNullability(true)), exec)
          // restore the logical Join's column order when the range
          // sides are swapped relative to the join's left/right
          if (swapped)
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
          !left.isStreaming && !right.isStreaming =>
      detect(left, right, cond) match {
        case Some((boundsKey, onKey, lo, hi, on, false)) =>
          RangeJoinExec(planLater(left), planLater(right),
            lo, hi, boundsKey, onKey, on,
            left.output ++ right.output.map(_.withNullability(true))) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** Returns (boundsKey, onKey, lo, hi, on, swapped): the equi key on
    * the bounds side, the equi key on the `on` side, the bound
    * expressions, the `on` attribute, and whether the bounds side is
    * the logical join's RIGHT child.
    */
  private def detect(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Attribute, Attribute, Expression,
        Expression, Attribute, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 3) return None
    val leftSet = left.outputSet
    val rightSet = right.outputSet
    def sideOf(e: Expression): Option[Boolean] = // Some(true) = left
      if (e.references.nonEmpty && e.references.subsetOf(leftSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(rightSet))
        Some(false)
      else None

    var equi: Option[(Attribute, Attribute)] = None // (left, right)
    // (bound expr, on attr, on side) for on > lo / on <= hi
    var lower: Option[(Expression, Attribute, Boolean)] = None
    var upper: Option[(Expression, Attribute, Boolean)] = None
    def classifyBound(onE: Expression, bndE: Expression,
        isLower: Boolean): Boolean = onE match {
      case a: Attribute => (sideOf(a), sideOf(bndE)) match {
        case (Some(onSide), Some(bndSide)) if onSide != bndSide =>
          if (isLower && lower.isEmpty) { lower = Some((bndE, a, onSide)); true }
          else if (!isLower && upper.isEmpty) { upper = Some((bndE, a, onSide)); true }
          else false
        case _ => false
      }
      case _ => false
    }
    for (c <- conjuncts) {
      val ok = c match {
        case EqualTo(a: Attribute, b: Attribute) =>
          (sideOf(a), sideOf(b)) match {
            case (Some(true), Some(false)) if equi.isEmpty =>
              equi = Some((a, b)); true
            case (Some(false), Some(true)) if equi.isEmpty =>
              equi = Some((b, a)); true
            case _ => false
          }
        case GreaterThan(onE, loE) => classifyBound(onE, loE, isLower = true)
        case LessThan(loE, onE) => classifyBound(onE, loE, isLower = true)
        case LessThanOrEqual(onE, hiE) => classifyBound(onE, hiE, isLower = false)
        case GreaterThanOrEqual(hiE, onE) => classifyBound(onE, hiE, isLower = false)
        case _ => false
      }
      if (!ok) return None
    }
    for {
      (lk, rk) <- equi
      (lo, onL, onSideL) <- lower
      (hi, onU, onSideU) <- upper
      if onL.semanticEquals(onU) && onSideL == onSideU
    } yield
      if (!onSideL) (lk, rk, lo, hi, onL, false) // on right, bounds left
      else (rk, lk, lo, hi, onL, true) // on left, bounds right: swap
  }
}
