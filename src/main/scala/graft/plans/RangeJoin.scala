package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.DataType

/** Native range (interval) join — the generalization of [[AsOfJoin]]
  * from "latest right row at-or-before" to "ALL right rows inside the
  * left row's interval": for every left row, every right row of the
  * same `by` group with `lo < rightOn <= hi`, or one null-extended row
  * when none match — LEFT-OUTER interval semantics (the shape of
  * "activity within the hour after each signup", q37).
  *
  * Spark plans the composable spelling (equi-join on `by` plus two
  * non-equi time conjuncts) as a hash join on `by` that post-filters
  * the time bounds: every same-key pair is materialized before the
  * filter, so a user with E events generates E² candidate pairs.
  * This operator is the plan a time-series engine picks: both sides
  * hash-partition on `by` and sort within partitions ONCE — then a
  * single merge pass per partition emits matches from a sliding
  * buffer of right rows. Because lefts arrive in ascending `lo`
  * order, a right row can be dropped permanently once `rightOn <= lo`
  * (no later left can reach back to it), so the buffer holds only the
  * rows inside the widest still-active window — O(n + m + output)
  * time, O(max concurrent window rows) memory, immune to the per-key
  * quadratic blow-up at 100 TB.
  */
object RangeJoin {

  /** Left-outer range join by column NAME (names resolve against each
    * side's analyzed output). Matches `lo < rightOn <= hi` — the
    * "(start, start+window]" convention of q37. The right side is
    * re-aliased to fresh expression ids, making self-joins safe.
    */
  def range(left: DataFrame, right: DataFrame,
      leftLo: String, leftHi: String,
      leftBy: String, rightBy: String, rightOn: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def res(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    GraftShim.ofRows(left.sparkSession,
      RangeJoinPlan(lp, rp,
        res(lp, leftLo), res(lp, leftHi),
        res(lp, leftBy), res(rp, rightBy), res(rp, rightOn)))
  }
}

/** Logical node: constructed resolved (attributes come from analyzed
  * children), so it passes straight through analysis; unknown to the
  * optimizer, which safely treats it as a barrier.
  */
final case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftLo: Expression, leftHi: Expression,
    leftBy: Expression, rightBy: Expression,
    rightOn: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge range join: requires both children clustered on
  * the `by` key and sorted by (by, lo) / (by, on) — EnsureRequirements
  * inserts the exchanges/sorts exactly as for a SortMergeJoin — then
  * merges each co-partition pair in one pass over a sliding right-row
  * buffer kept sorted by `on`.
  */
final case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftLo: Expression, leftHi: Expression,
    leftBy: Expression, rightBy: Expression,
    rightOn: Expression,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftLo, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits left rows in their sorted order (flatMap preserves
  // it), so downstream sorts on (by, lo) can be elided
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftLo, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val byOrd = ordFor(leftBy.dataType)
    val onOrd = ordFor(rightOn.dataType)
    val outAttrs = output
    val (lLoE, lHiE, lByE) = (leftLo, leftHi, leftBy)
    val (rOnE, rByE) = (rightOn, rightBy)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lLo = BindReferences.bindReference(lLoE, lOut)
      val lHi = BindReferences.bindReference(lHiE, lOut)
      val lBy = BindReferences.bindReference(lByE, lOut)
      val rOn = BindReferences.bindReference(rOnE, rOut)
      val rBy = BindReferences.bindReference(rByE, rOut)
      // the right input binds as NULLABLE: unmatched left rows read the
      // all-null row, and a non-nullable BoundReference would skip the
      // null check and read field zeros instead
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      // sliding merge state shared across left rows: buffered right
      // rows of the CURRENT left group, ascending `on`, every one past
      // the current left's `lo`; plus the one lookahead row (rows are
      // copied — the shuffle reuses buffers)
      val buf = new java.util.ArrayDeque[InternalRow]()
      var bufBy: Any = null // group the buffer belongs to
      var rCurr: InternalRow =
        if (rIter.hasNext) rIter.next().copy() else null

      /** Output rows for one left row: each buffered match, or the one
        * null-extended row. The returned iterator reads `buf` directly
        * and is always fully consumed before the next expand (flatMap
        * drains it), so the later mutation is safe.
        */
      def expand(lRow: InternalRow): Iterator[InternalRow] = {
        val lByV = lBy.eval(lRow)
        val loV = lLo.eval(lRow)
        val hiV = lHi.eval(lRow)
        // no key or no window: LEFT-OUTER still emits the row once
        if (lByV == null || loV == null || hiV == null)
          return Iterator.single(project(joined(lRow, nullRight)))
        // new group: the previous group's buffer can never match again
        if (bufBy == null || byOrd.compare(bufBy, lByV) != 0) buf.clear()
        bufBy = lByV
        // evict head rows at-or-before lo — later lefts of this group
        // have lo' >= lo, so these can never match again
        while (!buf.isEmpty && onOrd.compare(rOn.eval(buf.peekFirst()), loV) <= 0)
          buf.pollFirst()
        // advance the lookahead: skip earlier groups, null-`on` rows,
        // and rows at-or-before lo; buffer rows inside (lo, hi]; stop
        // at the first row past hi or past this group
        var advancing = true
        while (advancing && rCurr != null) {
          val rByV = rBy.eval(rCurr)
          val rOnV = rOn.eval(rCurr)
          val byCmp = if (rByV == null) -1 else byOrd.compare(rByV, lByV)
          if (byCmp < 0 || (byCmp == 0 && rOnV == null) ||
              (byCmp == 0 && onOrd.compare(rOnV, loV) <= 0)) {
            rCurr = if (rIter.hasNext) rIter.next().copy() else null
          } else if (byCmp == 0 && onOrd.compare(rOnV, hiV) <= 0) {
            buf.addLast(rCurr)
            rCurr = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        // matches are a PREFIX of the on-ascending buffer (rows past hi
        // are kept alive for wider later windows)
        val bufIt = buf.iterator()
        new Iterator[InternalRow] {
          private var matched = false
          private var nextR: InternalRow = null
          private var exhausted = false
          private def fetch(): Unit = {
            if (nextR != null || exhausted) return
            if (bufIt.hasNext) {
              val r = bufIt.next()
              if (onOrd.compare(rOn.eval(r), hiV) <= 0) { nextR = r; return }
            }
            exhausted = true
          }
          override def hasNext: Boolean = { fetch(); nextR != null || !matched }
          override def next(): InternalRow = {
            fetch()
            if (nextR != null) {
              matched = true
              val r = nextR; nextR = null
              project(joined(lRow, r))
            } else {
              matched = true; exhausted = true
              project(joined(lRow, nullRight))
            }
          }
        }
      }

      lIter.flatMap(l => expand(l.copy())).map { row =>
        numOutputRows += 1; row
      }
    }
  }

  private def ordFor(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt)
}

/** Planner strategy mapping the logical node onto the exec — injected
  * via `GraftExtensions.injectPlannerStrategy`.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: RangeJoinPlan =>
      RangeJoinExec(planLater(p.left), planLater(p.right),
        p.leftLo, p.leftHi, p.leftBy, p.rightBy, p.rightOn, p.output) :: Nil
    case _ => Nil
  }
}
