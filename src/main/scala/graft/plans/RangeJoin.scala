package graft.plans

import org.apache.spark.SparkException
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
import org.apache.spark.sql.types._

/** Null-free field comparator between two rows' ordinals, specialized
  * for the temporal/key types a time-series merge actually sees so the
  * per-pair compare is one primitive op with no boxing; exotic types
  * fall back to the interpreted ordering. Shared by [[RangeJoinExec]]
  * and [[AsOfJoinExec]] — the tight inner loop of both merges.
  */
private[plans] object FieldCmp {
  def apply(dt: DataType): (InternalRow, Int, InternalRow, Int) => Int =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (a, i, b, j) => java.lang.Long.compare(a.getLong(i), b.getLong(j))
      case IntegerType | DateType =>
        (a, i, b, j) => java.lang.Integer.compare(a.getInt(i), b.getInt(j))
      case DoubleType =>
        (a, i, b, j) => java.lang.Double.compare(a.getDouble(i), b.getDouble(j))
      case FloatType =>
        (a, i, b, j) => java.lang.Float.compare(a.getFloat(i), b.getFloat(j))
      case ShortType =>
        (a, i, b, j) => java.lang.Short.compare(a.getShort(i), b.getShort(j))
      case StringType =>
        (a, i, b, j) => a.getUTF8String(i).compareTo(b.getUTF8String(j))
      case _ =>
        val ord = TypeUtils.getInterpretedOrdering(dt)
        (a, i, b, j) => ord.compare(a.get(i, dt), b.get(j, dt))
    }

  /** Signed long difference (a - b) for long-backed field types —
    * timestamps are epoch micros inside UnsafeRow, so an as-of
    * tolerance in the column's native units needs no conversion.
    * None for types with no meaningful fixed-unit difference.
    */
  def diff(dt: DataType): Option[(InternalRow, Int, InternalRow, Int) => Long] =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        Some((a, i, b, j) => a.getLong(i) - b.getLong(j))
      case IntegerType | DateType =>
        Some((a, i, b, j) => a.getInt(i).toLong - b.getInt(j).toLong)
      case ShortType =>
        Some((a, i, b, j) => a.getShort(i).toLong - b.getShort(j).toLong)
      case _ => None
    }
}

/** Native range (interval) join — the generalization of [[AsOfJoin]]
  * from "latest right row at-or-before" to "ALL right rows inside the
  * left row's interval": for every left row, every right row of the
  * same `by` group inside the window, or one null-extended row when
  * none match — LEFT-OUTER interval semantics (the shape of "activity
  * within the hour after each signup", q37). The window's endpoint
  * inclusivity is parameterized: the default `(lo, hi]` is q37's
  * convention, and the auto-detection maps all four SQL spellings
  * (`>`/`>=` lower × `<`/`<=` upper) onto the flags.
  *
  * Spark plans the composable spelling (equi-join on `by` plus two
  * non-equi time conjuncts) as a hash join on `by` that post-filters
  * the time bounds: every same-key pair is materialized before the
  * filter, so a user with E events generates E² candidate pairs.
  * This operator is the plan a time-series engine picks: both sides
  * hash-partition on `by` and sort within partitions ONCE — then a
  * single merge pass per partition emits matches from a sliding
  * buffer of right rows. Because lefts arrive in ascending `lo`
  * order, a right row can be dropped permanently once it falls
  * at-or-before `lo` (no later left can reach back to it), so the
  * buffer holds only the rows inside the widest still-active window —
  * O(n + m + output) time, O(max concurrent window rows) memory,
  * immune to the per-key quadratic blow-up at 100 TB.
  */
object RangeJoin {

  /** Session conf key: in-memory rows in the per-partition sliding
    * buffer. The buffer's size is the algorithmic minimum (rows
    * concurrently inside one key's widest active window); a
    * pathological window ≫ gap input that exceeds the cap migrates to
    * a disk-spillable array (slower, completes) instead of growing
    * without bound — see [[org.apache.spark.sql.graftshim.SlidingRowBuffer]].
    */
  val MaxBufferRowsKey = "spark.graft.rangeJoin.maxBufferRows"
  val MaxBufferRowsDefault: Long = 16L * 1024 * 1024

  /** Session conf key: the final loud backstop — one join-key group
    * holding more buffered rows than this (per partition) fails the
    * task instead of silently filling the disk.
    */
  val HardMaxBufferRowsKey = "spark.graft.rangeJoin.hardMaxBufferRows"
  val HardMaxBufferRowsDefault: Long = 1L << 33

  private[plans] def capHint: String =
    s"The window spans far more rows than the gap between consecutive " +
      s"window starts. Narrow the window, pre-aggregate the right side, " +
      s"or raise $HardMaxBufferRowsKey."

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
  *
  * The merge is UnsafeRow-tight: each side's key expressions evaluate
  * through ONE generated [[UnsafeProjection]] (codegen, not
  * interpreted `eval`), every comparison is a primitive field-wise
  * [[FieldCmp]] with no boxing, buffered rows carry their extracted
  * key row so `on` is never re-evaluated per pair, and left rows are
  * never copied (the expand iterator drains before the next row
  * arrives). The only per-right-row costs are two small UnsafeRow
  * memcpys (row + 2-field key), paid once per right row, never per
  * emitted pair.
  */
final case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftLo: Expression, leftHi: Expression,
    leftBy: Expression, rightBy: Expression,
    rightOn: Expression,
    output: Seq[Attribute],
    loInclusive: Boolean = false,
    hiInclusive: Boolean = true) extends BinaryExecNode with CodegenSupport {

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
      "number of output rows"),
    "peakBufferRows" -> SQLMetrics.createMetric(sparkContext,
      "sum of per-task peak buffer rows"),
    "bufferSpills" -> SQLMetrics.createMetric(sparkContext,
      "buffer migrations to the spillable array"))

  /** Ordinal of `on` in the right row when it is a plain column —
    * buffered rows are then compared by one direct field read, no key
    * row and no re-evaluation; -1 for computed `on` expressions, which
    * fall back to a per-visit projection.
    */
  private def rightOnOrdinal: Int = rightOn match {
    case a: Attribute => right.output.indexWhere(_.exprId == a.exprId)
    case _ => -1
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val peakBufferRows = longMetric("peakBufferRows")
    val bufferSpills = longMetric("bufferSpills")
    val maxBufferRows = conf.getConfString(RangeJoin.MaxBufferRowsKey,
      RangeJoin.MaxBufferRowsDefault.toString).toLong
    val hardMaxBufferRows = conf.getConfString(RangeJoin.HardMaxBufferRowsKey,
      RangeJoin.HardMaxBufferRowsDefault.toString).toLong
    val onOrd = rightOnOrdinal
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lLoE, lHiE, lByE) = (leftLo, leftHi, leftBy)
    val (rOnE, rByE) = (rightOn, rightBy)
    val (loIncl, hiIncl) = (loInclusive, hiInclusive)
    val byDt = leftBy.dataType
    val onDt = rightOn.dataType
    val byDesc = leftBy.sql
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key layout: left (by=0, lo=1, hi=2); right (by=0, on=1)
      val lKeys = UnsafeProjection.create(Seq(lByE, lLoE, lHiE), lOut)
      val rKeys = UnsafeProjection.create(Seq(rByE, rOnE), rOut)
      val byCmp = FieldCmp(byDt)
      val onCmp = FieldCmp(onDt)
      // the right input binds as NULLABLE: unmatched left rows read the
      // all-null row, and a non-nullable BoundReference would skip the
      // null check and read field zeros instead
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      // sliding merge state shared across left rows: buffered right
      // rows of the CURRENT left group, ascending `on`, every one
      // inside the current left's window's past edge; plus the one
      // lookahead row (rows are copied — the shuffle reuses buffers)
      val buf = new org.apache.spark.sql.graftshim.SlidingRowBuffer(
        maxBufferRows, hardMaxBufferRows, RangeJoin.capHint)
      var groupKeys: UnsafeRow = null // by (field 0) of the buffer's group
      var taskPeak = 0L
      var taskSpills = 0L
      var rCurrRow: InternalRow = null
      var rCurrKeys: UnsafeRow = null
      def fetchRight(): Unit =
        if (rIter.hasNext) {
          rCurrRow = rIter.next().copy()
          rCurrKeys = rKeys(rCurrRow).copy()
        } else { rCurrRow = null; rCurrKeys = null }
      fetchRight()

      // `on` of a buffered row: a direct field read when `on` is a
      // plain column (the API always resolves one), else a projection
      val visitKeys: InternalRow => InternalRow =
        if (onOrd >= 0) identity
        else { val p = UnsafeProjection.create(Seq(rByE, rOnE), rOut); p(_) }
      val visitOrd = if (onOrd >= 0) onOrd else 1

      // is a right `on` (keys field 1) past the left `lo` (lk field 1)?
      def pastLo(rk: UnsafeRow, lk: UnsafeRow): Boolean = {
        val c = onCmp(rk, 1, lk, 1)
        c > 0 || (loIncl && c == 0)
      }
      // buffered-row variants read `on` straight off the data row
      def pastLoRow(row: InternalRow, lk: UnsafeRow): Boolean = {
        val c = onCmp(visitKeys(row), visitOrd, lk, 1)
        c > 0 || (loIncl && c == 0)
      }
      def withinHiRow(row: InternalRow, lk: UnsafeRow): Boolean = {
        val c = onCmp(visitKeys(row), visitOrd, lk, 2)
        c < 0 || (hiIncl && c == 0)
      }

      /** Output rows for one left row: each buffered match, or the one
        * null-extended row. The returned iterator reads `buf` and the
        * reused `lk` projection row directly and is always fully
        * consumed before the next expand (flatMap drains it), so the
        * later mutation is safe.
        */
      def expand(lRow: InternalRow): Iterator[InternalRow] = {
        val lk = lKeys(lRow)
        // no key or no window: LEFT-OUTER still emits the row once
        if (lk.isNullAt(0) || lk.isNullAt(1) || lk.isNullAt(2))
          return Iterator.single(project(joined(lRow, nullRight)))
        // new group: the previous group's buffer can never match again
        if (groupKeys == null || byCmp(groupKeys, 0, lk, 0) != 0) {
          buf.clear()
          groupKeys = lk.copy()
        }
        // evict head rows at the window's past edge — later lefts of
        // this group have lo' >= lo, so these can never match again
        while (!buf.isEmpty && !pastLoRow(buf.peekFirst(), lk))
          buf.pollFirst()
        // advance the lookahead: skip earlier groups, null-`on` rows,
        // and rows at-or-before the past edge; buffer rows up to hi;
        // stop at the first row past hi or past this group
        var advancing = true
        while (advancing && rCurrRow != null) {
          val byC =
            if (rCurrKeys.isNullAt(0)) -1 else byCmp(rCurrKeys, 0, lk, 0)
          if (byC < 0 || (byC == 0 &&
              (rCurrKeys.isNullAt(1) || !pastLo(rCurrKeys, lk)))) {
            fetchRight()
          } else if (byC == 0 && onCmp(rCurrKeys, 1, lk, 2) <= 0) {
            buf.addLast(rCurrRow)
            if (buf.size > taskPeak) {
              peakBufferRows += buf.size - taskPeak
              taskPeak = buf.size
            }
            if (buf.spills > taskSpills) {
              bufferSpills += buf.spills - taskSpills
              taskSpills = buf.spills
            }
            fetchRight()
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
              val row = bufIt.next()
              if (withinHiRow(row, lk)) { nextR = row; return }
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

      // no left-row copy: expand's iterator drains before the next row
      lIter.flatMap(expand).map { row => numOutputRows += 1; row }
    }
  }

  // ——— whole-stage codegen (SortMergeJoinExec-style produce leaf) ———
  //
  // Same structure as [[AsOfJoinExec]]'s codegen: the children feed the
  // generated class as row iterators and the merge loop itself is
  // generated, so downstream operators fuse with it — no iterator
  // boundary or output materialization above the join. The one extra
  // wrinkle over as-of is that a left row emits MANY rows (its buffer
  // prefix), and `shouldStop()` can suspend the loop after any of
  // them; all merge state (current left row, its extracted keys, the
  // buffer's live iterator, the matched flag) therefore lives in
  // mutable fields, making the produce loop a resumable state machine
  // rather than nested loops with stack state.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override def canCheckLimitNotReached: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String = {
    val numOutput = metricTerm(ctx, "numOutputRows")
    val peakMetric = metricTerm(ctx, "peakBufferRows")
    val spillMetric = metricTerm(ctx, "bufferSpills")
    val maxBufferRows = conf.getConfString(RangeJoin.MaxBufferRowsKey,
      RangeJoin.MaxBufferRowsDefault.toString).toLong
    val hardMaxBufferRows = conf.getConfString(RangeJoin.HardMaxBufferRowsKey,
      RangeJoin.HardMaxBufferRowsDefault.toString).toLong
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];")

    val byDt = leftBy.dataType
    val onDt = rightOn.dataType
    val byJt = CodeGenerator.javaType(byDt)
    val onJt = CodeGenerator.javaType(onDt)
    val loJt = CodeGenerator.javaType(leftLo.dataType)
    val hiJt = CodeGenerator.javaType(leftHi.dataType)

    // lookahead right row (copied) + extracted keys
    val rCurr = ctx.addMutableState("InternalRow", "rCurr")
    val rBy = ctx.addMutableState(byJt, "rBy")
    val rByNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rByNull")
    val rOn = ctx.addMutableState(onJt, "rOn")
    val rOnNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "rOnNull")
    // resumable per-left-row state
    val lRow = ctx.addMutableState("InternalRow", "lRow")
    val lBy = ctx.addMutableState(byJt, "lBy")
    val lLo = ctx.addMutableState(loJt, "lLo")
    val lHi = ctx.addMutableState(hiJt, "lHi")
    val bufIt = ctx.addMutableState("java.util.Iterator", "bufIt")
    val matchedAny = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "matchedAny")
    // sliding buffer of the current group's candidate right rows —
    // in-memory deque under the cap, disk-spillable array past it
    val hint = RangeJoin.capHint.replace("\\", "\\\\").replace("\"", "\\\"")
    val buf = ctx.addMutableState(
      "org.apache.spark.sql.graftshim.SlidingRowBuffer", "buf",
      v => s"""$v = new org.apache.spark.sql.graftshim.SlidingRowBuffer(
         |  ${maxBufferRows}L, ${hardMaxBufferRows}L, "$hint");""".stripMargin)
    val groupSet = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "groupSet")
    val groupBy = ctx.addMutableState(byJt, "groupBy")
    val taskPeak = ctx.addMutableState(CodeGenerator.JAVA_LONG, "taskPeak")
    val taskSpills = ctx.addMutableState(CodeGenerator.JAVA_LONG, "taskSpills")
    val inited = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "inited")

    val savedRow = ctx.INPUT_ROW
    val savedVars = ctx.currentVars

    // fetchRight(): copy the next right row and extract (by, on)
    val rRow = ctx.freshName("rRow")
    ctx.INPUT_ROW = rRow
    ctx.currentVars = null
    val rByEv = bindReference[Expression](rightBy, right.output).genCode(ctx)
    val rOnEv = bindReference[Expression](rightOn, right.output).genCode(ctx)
    val fetchRight = ctx.addNewFunction("rangeFetchRight",
      s"""
         |private void rangeFetchRight() {
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

    // on-value of a buffered row (buffered rows never carry a null on)
    val bRowTerm = ctx.freshName("bRow")
    ctx.INPUT_ROW = bRowTerm
    ctx.currentVars = null
    val bOnEv = bindReference[Expression](rightOn, right.output).genCode(ctx)
    val bufOnBody =
      s"""
         |${bOnEv.code}
         |return ${bOnEv.value};
       """.stripMargin
    val bufOn = ctx.addNewFunction("rangeBufOn",
      s"""
         |private $onJt rangeBufOn(InternalRow $bRowTerm) {
         |  ${bufOnBody.trim}
         |}
       """.stripMargin)

    // left keys, evaluated when a left row is loaded
    val lRowLocal = ctx.freshName("leftRow")
    ctx.INPUT_ROW = lRowLocal
    ctx.currentVars = null
    val lByEv = bindReference[Expression](leftBy, left.output).genCode(ctx)
    val lLoEv = bindReference[Expression](leftLo, left.output).genCode(ctx)
    val lHiEv = bindReference[Expression](leftHi, left.output).genCode(ctx)

    // left columns read the persisted lRow; right columns null-guard
    ctx.INPUT_ROW = lRow
    ctx.currentVars = null
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

    // group key must outlive the left iterator row it came from
    val copyBy = byDt match {
      case StringType => s"$lBy.clone()"
      case BinaryType => s"(byte[]) $lBy.clone()"
      case _ => lBy
    }
    // endpoint tests, with the convention flags baked in as constants
    def pastLo(c: String) =
      if (loInclusive) s"($c) >= 0" else s"($c) > 0"
    def withinHi(c: String) =
      if (hiInclusive) s"($c) <= 0" else s"($c) < 0"
    val byDesc = leftBy.sql.replace("\\", "\\\\").replace("\"", "\\\"")

    // the loop must terminate by falling through (flag, not `return`):
    // under an aggregate parent this whole block lands inside
    // doAggregateWithoutKey(), where an infinite `while (true)` makes
    // the code emitted after it unreachable — Janino rejects the stage
    // and Spark silently falls back to interpreted execution
    val done = ctx.freshName("rangeDone")
    s"""
       |if (!$inited) {
       |  $inited = true;
       |  $fetchRight();
       |}
       |boolean $done = false;
       |while (!$done) {
       |  InternalRow $matchRow = null;
       |  boolean emit = false;
       |  if ($bufIt == null) {
       |    // load the next left row, or finish the partition
       |    if (!($limitNotReachedCond $leftInput.hasNext())) { $done = true; continue; }
       |    $lRow = (InternalRow) $leftInput.next();
       |    InternalRow $lRowLocal = $lRow;
       |    ${lByEv.code}
       |    ${lLoEv.code}
       |    ${lHiEv.code}
       |    if (${lByEv.isNull} || ${lLoEv.isNull} || ${lHiEv.isNull}) {
       |      emit = true; // LEFT-OUTER: no key or window still emits once
       |    } else {
       |      $lBy = ${lByEv.value};
       |      $lLo = ${lLoEv.value};
       |      $lHi = ${lHiEv.value};
       |      // new group: the old buffer can never match again
       |      if (!$groupSet || (${ctx.genComp(byDt, groupBy, lBy)}) != 0) {
       |        $buf.clear();
       |        $groupBy = $copyBy;
       |        $groupSet = true;
       |      }
       |      // evict head rows at the window's past edge
       |      while (!$buf.isEmpty()) {
       |        $onJt hOn = $bufOn((InternalRow) $buf.peekFirst());
       |        if (${pastLo(ctx.genComp(onDt, "hOn", lLo))}) break;
       |        $buf.pollFirst();
       |      }
       |      // advance the lookahead: skip earlier groups / null-on /
       |      // at-or-before the past edge; buffer rows up to hi
       |      boolean advancing = true;
       |      while (advancing && $rCurr != null) {
       |        int byC = $rByNull ? -1 : (${ctx.genComp(byDt, rBy, lBy)});
       |        if (byC < 0 || (byC == 0 && ($rOnNull ||
       |            !(${pastLo(ctx.genComp(onDt, rOn, lLo))})))) {
       |          $fetchRight();
       |        } else if (byC == 0 &&
       |            (${ctx.genComp(onDt, rOn, lHi)}) <= 0) {
       |          $buf.addLast($rCurr);
       |          if ($buf.size() > $taskPeak) {
       |            $peakMetric.add($buf.size() - $taskPeak);
       |            $taskPeak = $buf.size();
       |          }
       |          if ($buf.spills() > $taskSpills) {
       |            $spillMetric.add($buf.spills() - $taskSpills);
       |            $taskSpills = $buf.spills();
       |          }
       |          $fetchRight();
       |        } else {
       |          advancing = false;
       |        }
       |      }
       |      $matchedAny = false;
       |      $bufIt = $buf.iterator();
       |    }
       |  }
       |  if (!emit) {
       |    // matches are a PREFIX of the on-ascending buffer
       |    boolean exhausted = false;
       |    while ($matchRow == null && !exhausted) {
       |      if ($bufIt.hasNext()) {
       |        InternalRow cand = (InternalRow) $bufIt.next();
       |        $onJt cOn = $bufOn(cand);
       |        if (${withinHi(ctx.genComp(onDt, "cOn", lHi))}) {
       |          $matchRow = cand;
       |        } else {
       |          exhausted = true;
       |        }
       |      } else {
       |        exhausted = true;
       |      }
       |    }
       |    if ($matchRow != null) {
       |      $matchedAny = true;
       |      emit = true;
       |    } else {
       |      $bufIt = null; // this left row is done
       |      if (!$matchedAny) emit = true; // LEFT-OUTER null extension
       |    }
       |  }
       |  if (emit) {
       |    $numOutput.add(1);
       |    ${consume(ctx, leftVars ++ rightVars).trim}
       |    $shouldStopCheckCode
       |  }
       |}
     """.stripMargin
  }
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
