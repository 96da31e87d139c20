package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray

/** Sliding right-row buffer for the native range join
  * (`graft.plans.RangeJoinExec`), shared by its interpreted and
  * generated merge loops. Lives in this package only because the spill
  * structure it falls back onto — Spark's battle-tested
  * [[ExternalAppendOnlyUnsafeRowArray]], the same one SortMergeJoin and
  * Window buffer matches into — is `private[sql]`.
  *
  * Two regimes:
  *
  *  - '''In-memory (the algorithmic case).''' A plain `ArrayDeque` of
  *    copied rows: O(1) add/evict/peek, size = rows concurrently
  *    inside one key's widest active window. This is the only regime a
  *    healthy workload ever sees.
  *  - '''Spilled (the pathological window ≫ gap case).''' Past
  *    `inMemCap` rows the deque migrates into an
  *    [[ExternalAppendOnlyUnsafeRowArray]] (memory-managed, spills to
  *    disk under pressure) and head-eviction becomes a logical start
  *    index — nothing is physically removed until the group changes,
  *    so disk holds at most one group's right rows. Head peeks ride a
  *    cached cursor; each emission pass streams from the start index,
  *    so a left row's match scan costs O(skip + matches) reads — the
  *    documented slow-but-completing trade, replacing round 5's hard
  *    abort.
  *
  * `hardCap` is the final loud backstop: a group that exceeds it (per
  * partition) throws with the caller's hint instead of filling the
  * disk silently.
  */
final class SlidingRowBuffer(
    inMemCap: Long, hardCap: Long, capErrorHint: String) {

  private val deque = new java.util.ArrayDeque[InternalRow]()
  private var spilled: ExternalAppendOnlyUnsafeRowArray = null
  private var startIdx: Int = 0
  private var spillCount: Long = 0L
  // one row of every group resisted spilling (non-UnsafeRow input —
  // only constructed-in-test plans produce these); stay on the deque
  private var spillable = true

  // head cursor over the spilled array: `cachedHead` is the row at
  // `startIdx` (null = not read yet), `headIter` a live iterator
  // positioned at `headIterIdx`
  private var headIter: Iterator[UnsafeRow] = null
  private var headIterIdx: Int = 0
  private var cachedHead: InternalRow = null

  /** Completed migrations to the spill structure (feeds a SQL metric). */
  def spills: Long = spillCount

  def size: Long =
    if (spilled == null) deque.size.toLong else (spilled.length - startIdx).toLong

  def isEmpty: Boolean = size == 0L

  def clear(): Unit = {
    deque.clear()
    if (spilled != null) { spilled.clear(); spilled = null }
    startIdx = 0
    headIter = null
    cachedHead = null
  }

  def addLast(row: InternalRow): Unit = {
    if (size + 1 > hardCap) throw new IllegalStateException(
      s"range-join buffer exceeded the hard cap of $hardCap rows in one " +
        s"join-key group. $capErrorHint")
    if (spilled == null) {
      deque.addLast(row)
      if (deque.size > inMemCap && spillable) migrate()
    } else {
      spilled.add(row.asInstanceOf[UnsafeRow])
      headIter = null // adds invalidate outstanding iterators
      cachedHead = null
    }
  }

  private def migrate(): Unit = {
    val it = deque.iterator()
    var allUnsafe = true
    while (allUnsafe && it.hasNext)
      allUnsafe = it.next().isInstanceOf[UnsafeRow]
    if (!allUnsafe) { spillable = false; return }
    // in-memory threshold low (the deque already proved the window is
    // pathological), force-spill every 4M rows, size thresholds lax —
    // the task memory manager governs actual memory from here on
    spilled = new ExternalAppendOnlyUnsafeRowArray(
      4096, 64L << 20, 1 << 22, 1L << 40)
    val drain = deque.iterator()
    while (drain.hasNext) spilled.add(drain.next().asInstanceOf[UnsafeRow])
    deque.clear()
    startIdx = 0
    headIter = null
    cachedHead = null
    spillCount += 1
  }

  /** The oldest live row. In spill mode the returned row is only valid
    * until the next buffer call — callers compare and drop it.
    */
  def peekFirst(): InternalRow = {
    if (spilled == null) return deque.peekFirst()
    if (cachedHead == null) {
      if (headIter == null || headIterIdx != startIdx) {
        headIter = spilled.generateIterator(startIdx)
        headIterIdx = startIdx
      }
      cachedHead = headIter.next()
      headIterIdx += 1
    }
    cachedHead
  }

  /** Drop the oldest live row (after a [[peekFirst]] compare). */
  def pollFirst(): Unit = {
    if (spilled == null) { deque.pollFirst(); return }
    if (cachedHead == null) peekFirst() // align the cursor
    startIdx += 1
    cachedHead = null // headIterIdx == startIdx: cursor stays warm
  }

  /** Iterate the live rows oldest-first. Valid until the next add or
    * clear; in spill mode rows are only valid until the iterator
    * advances.
    */
  def iterator(): java.util.Iterator[InternalRow] = {
    if (spilled == null) return deque.iterator()
    val s = spilled.generateIterator(startIdx)
    new java.util.Iterator[InternalRow] {
      override def hasNext: Boolean = s.hasNext
      override def next(): InternalRow = s.next()
    }
  }
}
