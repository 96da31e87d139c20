package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.BindReferences.bindReference
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the whole-operator extension rung of the ladder
  * (custom LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions`): for every left row, attach the single
  * latest right row with `rightOn <= leftOn` in the same `by` group
  * (ties on `rightOn` broken by the largest `rightTie`), or nulls —
  * LEFT-OUTER as-of semantics.
  *
  * Spark has no built-in as-of join; the composable spelling (range
  * join + per-key top-1 window, q36) shuffles every candidate pair and
  * then sorts to discard all but one per left row. This operator is the
  * plan a time-series engine would pick: both sides hash-partition on
  * the `by` key and sort within partitions ONCE — then a single O(n+m)
  * merge pass per partition emits the answer. No candidate-pair
  * blow-up, no window; the merge state is one buffered right row. At
  * 100 TB the cost is exactly two exchanges + two sorts (the SMJ
  * floor), immune to users with many clicks-per-purchase, where the
  * window spelling degrades with the candidate fan-out.
  */
object AsOfJoin {

  /** Left-outer as-of join by column NAME (names resolve against each
    * side's analyzed output, so the API needs no Column internals).
    * The right side is re-aliased to fresh expression ids, making
    * self-joins (same source on both sides) safe.
    *
    * `direction`: "backward" (default) attaches the LATEST right row
    * with `rightOn <= leftOn` (ties broken by the largest `rightTie`);
    * "forward" attaches the EARLIEST right row with
    * `rightOn >= leftOn` (ties by the smallest tie — closest-first in
    * both directions); "nearest" attaches whichever of those two
    * candidates is closer by |leftOn - rightOn| (equidistant → the
    * backward one, matching the at-or-before default). `tolerance`
    * (in the on-column's native long units — micros for timestamps,
    * raw for integer types) nulls the match when |leftOn - rightOn|
    * exceeds it; since the as-of match is the closest candidate in
    * its direction, a match outside tolerance proves no candidate
    * within it exists. "nearest" requires a long-backed on-type
    * (the distance itself must be computable).
    */
  def asof(left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      leftBy: String, rightBy: String,
      rightTie: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    if (!Set("backward", "forward", "nearest")(direction))
      throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got $direction")
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def res(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lOn = res(lp, leftOn)
    if ((tolerance.isDefined || direction == "nearest") &&
        FieldCmp.diff(lOn.dataType).isEmpty)
      throw new IllegalArgumentException(
        s"$direction/tolerance unsupported for on-type ${lOn.dataType}")
    GraftShim.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        lOn, res(rp, rightOn),
        res(lp, leftBy), res(rp, rightBy), res(rp, rightTie),
        direction, tolerance))
  }
}

/** Logical node: constructed resolved (attributes come from analyzed
  * children), so it passes straight through analysis; unknown to the
  * optimizer, which safely treats it as a barrier.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    rightTie: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join: requires both children clustered on
  * the `by` key and sorted by (by, on[, tie]) — Spark's
  * EnsureRequirements inserts the exchanges/sorts exactly as it would
  * for a SortMergeJoin — then merges each co-partition pair in one
  * O(n+m) pass holding a single buffered right row.
  */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    rightTie: Expression,
    direction: String,
    tolerance: Option[Long],
    output: Seq[Attribute]) extends BinaryExecNode with CodegenSupport {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  /** UnsafeRow-tight merge: each side's (by, on) keys evaluate through
    * ONE generated [[UnsafeProjection]] (codegen, not interpreted
    * `eval`), comparisons are primitive field-wise [[FieldCmp]] ops
    * with no boxing, the best-match row keeps its extracted key row so
    * nothing is ever re-evaluated, and left rows are never copied (the
    * output projection consumes them before the iterator advances).
    */
  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val byDt = leftBy.dataType
    val onDt = leftOn.dataType
    val outAttrs = output
    val (lOnE, lByE) = (leftOn, leftBy)
    val (rOnE, rByE) = (rightOn, rightBy)
    val dir = direction
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key layout, both sides: (by=0, on=1)
      val lKeys = UnsafeProjection.create(Seq(lByE, lOnE), lOut)
      val rKeys = UnsafeProjection.create(Seq(rByE, rOnE), rOut)
      val byCmp = FieldCmp(byDt)
      val onCmp = FieldCmp(onDt)
      val onDiff =
        if (tol.isDefined || dir == "nearest") Some(FieldCmp.diff(onDt).get)
        else None
      // the right input binds as NULLABLE: unmatched left rows read the
      // all-null row, and a non-nullable BoundReference would skip the
      // null check and read field zeros instead
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // single-row merge state: the lookahead right row and the best
        // match so far, each alongside its extracted keys (copied — the
        // shuffle reuses row buffers, the projection its result row)
        private var rCurrRow: InternalRow = null
        private var rCurrKeys: UnsafeRow = null
        private var bestRow: InternalRow = null
        private var bestKeys: UnsafeRow = null
        private def fetchRight(): Unit =
          if (rIter.hasNext) {
            rCurrRow = rIter.next().copy()
            rCurrKeys = rKeys(rCurrRow).copy()
          } else { rCurrRow = null; rCurrKeys = null }
        fetchRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lKeys(lRow)
          if (lk.isNullAt(0) || lk.isNullAt(1)) {
            joined(lRow, nullRight)
          } else if (dir == "backward") {
            // BACKWARD: advance the right side through every row
            // at-or-before (by, on); the last same-group row seen is
            // the match (sorted by tie, so the largest tie wins among
            // equal `on`). Null-`on` rows sort at the HEAD of their
            // group (ascending nulls-first) and can never match —
            // consume them like earlier-group rows or they'd block the
            // cursor for the whole group.
            var advancing = true
            while (advancing && rCurrRow != null) {
              val onNull = rCurrKeys.isNullAt(1)
              val byC =
                if (rCurrKeys.isNullAt(0)) -1 else byCmp(rCurrKeys, 0, lk, 0)
              if (byC < 0 || (byC == 0 &&
                  (onNull || onCmp(rCurrKeys, 1, lk, 1) <= 0))) {
                if (byC == 0 && !onNull) {
                  bestRow = rCurrRow; bestKeys = rCurrKeys
                }
                fetchRight()
              } else advancing = false
            }
            val matched = bestRow != null && !bestKeys.isNullAt(0) &&
              byCmp(bestKeys, 0, lk, 0) == 0 &&
              // latest-at-or-before is the CLOSEST candidate: if it
              // breaks tolerance, nothing within tolerance exists
              (onDiff.isEmpty || onDiff.get(lk, 1, bestKeys, 1) <= tol.get)
            joined(lRow, if (matched) bestRow else nullRight)
          } else {
            // FORWARD / NEAREST: advance past every row strictly
            // before (by, on) — the cursor then rests on the earliest
            // at-or-after row (smallest tie first under the (on, tie)
            // sort), which may serve several left rows, so it is NOT
            // consumed. Null-`on` rows sort at the group head and are
            // consumed the same way as earlier-group rows. NEAREST
            // additionally remembers the last strictly-before row
            // while consuming (the backward candidate) and picks the
            // closer of the two; equidistant prefers backward.
            var advancing = true
            while (advancing && rCurrRow != null) {
              val onNull = rCurrKeys.isNullAt(1)
              val byC =
                if (rCurrKeys.isNullAt(0)) -1 else byCmp(rCurrKeys, 0, lk, 0)
              if (byC < 0 || (byC == 0 &&
                  (onNull || onCmp(rCurrKeys, 1, lk, 1) < 0))) {
                if (byC == 0 && !onNull) {
                  bestRow = rCurrRow; bestKeys = rCurrKeys
                }
                fetchRight()
              } else advancing = false
            }
            val fwdOk = rCurrRow != null && !rCurrKeys.isNullAt(0) &&
              byCmp(rCurrKeys, 0, lk, 0) == 0
            if (dir == "forward") {
              val matched = fwdOk &&
                (onDiff.isEmpty || onDiff.get(rCurrKeys, 1, lk, 1) <= tol.get)
              joined(lRow, if (matched) rCurrRow else nullRight)
            } else { // nearest
              val diff = onDiff.get
              val bwdOk = bestRow != null && !bestKeys.isNullAt(0) &&
                byCmp(bestKeys, 0, lk, 0) == 0
              val bDist = if (bwdOk) diff(lk, 1, bestKeys, 1) else Long.MaxValue
              val fDist = if (fwdOk) diff(rCurrKeys, 1, lk, 1) else Long.MaxValue
              val useBwd = bwdOk && bDist <= fDist
              val dist = if (useBwd) bDist else fDist
              val matched = (bwdOk || fwdOk) &&
                tol.forall(dist <= _)
              joined(lRow,
                if (!matched) nullRight
                else if (useBwd) bestRow else rCurrRow)
            }
          }
          numOutputRows += 1
          project(joined)
        }
      }
    }
  }

  // ——— whole-stage codegen (SortMergeJoinExec-style produce leaf) ———
  //
  // The merge loop is generated into the WholeStageCodegen stage, so
  // downstream operators (filters, projections, partial aggregates)
  // fuse with it — no iterator boundary and no output-row
  // materialization above the join. Like SortMergeJoinExec, the two
  // children feed the generated class as plain row iterators
  // (`inputRDDs`), so each child's sort still terminates its own
  // stage; what this removes is the boundary ABOVE the join that the
  // interpreted path (wrapped in InputAdapter) pays. The generated
  // merge mirrors doExecute() line for line: one copied lookahead
  // right row, one remembered backward candidate, direction-specific
  // advance — with the direction and tolerance baked in as constants
  // at generation time, so only the branch this query needs is
  // emitted.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the buffered right-row copy and the reused
  // left iterator row; a blocking parent must copy
  override def needCopyResult: Boolean = true

  // the merge consumes its children as iterators (inputRDDs), not via
  // produce, so like SortMergeJoinExec it is a valid place to check
  // the limit-not-reached condition
  override def canCheckLimitNotReached: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String = {
    val numOutput = metricTerm(ctx, "numOutputRows")
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];")

    val byDt = leftBy.dataType
    val onDt = leftOn.dataType
    val byJt = CodeGenerator.javaType(byDt)
    val onJt = CodeGenerator.javaType(onDt)

    // lookahead right row (copied — the sorter reuses row buffers)
    // plus its extracted keys; the backward candidate likewise
    val rCurr = ctx.addMutableState("InternalRow", "rCurr")
    val rBy = ctx.addMutableState(byJt, "rBy")
    val rByNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rByNull")
    val rOn = ctx.addMutableState(onJt, "rOn")
    val rOnNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rOnNull")
    val best = ctx.addMutableState("InternalRow", "bestRow")
    val bestBy = ctx.addMutableState(byJt, "bestBy")
    val bestOn = ctx.addMutableState(onJt, "bestOn")
    val inited = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "inited")

    val savedRow = ctx.INPUT_ROW
    val savedVars = ctx.currentVars

    // fetchRight(): copy the next right row and extract (by, on)
    val rRow = ctx.freshName("rRow")
    ctx.INPUT_ROW = rRow
    ctx.currentVars = null
    val rByEv = bindReference[Expression](rightBy, right.output).genCode(ctx)
    val rOnEv = bindReference[Expression](rightOn, right.output).genCode(ctx)
    val fetchRight = ctx.addNewFunction("asofFetchRight",
      s"""
         |private void asofFetchRight() {
         |  if ($rightInput.hasNext()) {
         |    InternalRow $rRow = ((InternalRow) $rightInput.next()).copy();
         |    ${rByEv.code}
         |    ${rOnEv.code}
         |    $rCurr = $rRow;
         |    $rByNull = ${rByEv.isNull};
         |    $rBy = ${rByEv.value};
         |    $rOnNull = ${rOnEv.isNull};
         |    $rOn = ${rOnEv.value};
         |  } else {
         |    $rCurr = null;
         |  }
         |}
       """.stripMargin)

    // left keys, evaluated once per left row
    val leftRow = ctx.freshName("leftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lByEv = bindReference[Expression](leftBy, left.output).genCode(ctx)
    val lOnEv = bindReference[Expression](leftOn, left.output).genCode(ctx)

    // left output columns ride the left row (consume defers what the
    // parent doesn't use); right columns null-guard on the match row
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matchRow = ctx.freshName("matchRow")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("rColNull")
      val value = ctx.freshName("rColVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val cd =
        code"""
          |boolean $isNull = true;
          |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
          |if ($matchRow != null) {
          |  $isNull = $matchRow.isNullAt($i);
          |  if (!$isNull) {
          |    $value = ${CodeGenerator.getValue(matchRow, a.dataType, i.toString)};
          |  }
          |}""".stripMargin
      ExprCode(cd, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    ctx.INPUT_ROW = savedRow
    ctx.currentVars = savedVars

    // tolerance distances in the on-column's native long units — the
    // API guards that tolerance/nearest imply a long-backed on-type
    def asLong(v: String): String = onDt match {
      case LongType | TimestampType | TimestampNTZType => v
      case _ => s"(long) $v"
    }
    val lOn = lOnEv.value.code
    val lBy = lByEv.value.code

    val directionCode = direction match {
      case "backward" =>
        val tolOk = tolerance
          .map(t => s"(${asLong(lOn)} - ${asLong(bestOn)}) <= ${t}L")
          .getOrElse("true")
        s"""
           |boolean advancing = true;
           |while (advancing && $rCurr != null) {
           |  int byC = $rByNull ? -1 : (${ctx.genComp(byDt, rBy, lBy)});
           |  if (byC < 0 || (byC == 0 &&
           |      ($rOnNull || (${ctx.genComp(onDt, rOn, lOn)}) <= 0))) {
           |    if (byC == 0 && !$rOnNull) {
           |      $best = $rCurr; $bestBy = $rBy; $bestOn = $rOn;
           |    }
           |    $fetchRight();
           |  } else {
           |    advancing = false;
           |  }
           |}
           |if ($best != null && (${ctx.genComp(byDt, bestBy, lBy)}) == 0 &&
           |    $tolOk) {
           |  $matchRow = $best;
           |}
         """.stripMargin
      case _ => // forward / nearest share the strictly-before advance
        val fwdTolOk = tolerance
          .map(t => s"(${asLong(rOn)} - ${asLong(lOn)}) <= ${t}L")
          .getOrElse("true")
        val pick =
          if (direction == "forward")
            s"""
               |if (fwdOk && $fwdTolOk) { $matchRow = $rCurr; }
             """.stripMargin
          else {
            val tolOk = tolerance.map(t => s"dist <= ${t}L").getOrElse("true")
            s"""
               |boolean bwdOk = $best != null &&
               |  (${ctx.genComp(byDt, bestBy, lBy)}) == 0;
               |long bDist = bwdOk ?
               |  (${asLong(lOn)} - ${asLong(bestOn)}) : Long.MAX_VALUE;
               |long fDist = fwdOk ?
               |  (${asLong(rOn)} - ${asLong(lOn)}) : Long.MAX_VALUE;
               |boolean useBwd = bwdOk && bDist <= fDist;
               |long dist = useBwd ? bDist : fDist;
               |if ((bwdOk || fwdOk) && $tolOk) {
               |  $matchRow = useBwd ? $best : $rCurr;
               |}
             """.stripMargin
          }
        s"""
           |boolean advancing = true;
           |while (advancing && $rCurr != null) {
           |  int byC = $rByNull ? -1 : (${ctx.genComp(byDt, rBy, lBy)});
           |  if (byC < 0 || (byC == 0 &&
           |      ($rOnNull || (${ctx.genComp(onDt, rOn, lOn)}) < 0))) {
           |    if (byC == 0 && !$rOnNull) {
           |      $best = $rCurr; $bestBy = $rBy; $bestOn = $rOn;
           |    }
           |    $fetchRight();
           |  } else {
           |    advancing = false;
           |  }
           |}
           |boolean fwdOk = $rCurr != null && !$rByNull &&
           |  (${ctx.genComp(byDt, rBy, lBy)}) == 0;
           |$pick
         """.stripMargin
    }

    s"""
       |if (!$inited) {
       |  $inited = true;
       |  $fetchRight();
       |}
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lByEv.code}
       |  ${lOnEv.code}
       |  InternalRow $matchRow = null;
       |  if (!(${lByEv.isNull} || ${lOnEv.isNull})) {
       |    ${directionCode.trim}
       |  }
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars).trim}
       |  $shouldStopCheckCode
       |}
     """.stripMargin
  }
}

/** Planner strategy mapping the logical node onto the exec — injected
  * via `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftOn, p.rightOn, p.leftBy, p.rightBy, p.rightTie,
        p.direction, p.tolerance, p.output) :: Nil
    case _ => Nil
  }
}
