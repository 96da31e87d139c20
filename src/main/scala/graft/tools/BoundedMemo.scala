package graft.tools

import scala.util.control.NonFatal

/** LRU memo with a hard entry cap — the driver-side caches for derived
  * artifacts (persisted DataFrames, GraphX graphs, store handles) are
  * keyed by (session, dataset) and would otherwise grow without bound
  * in a long-lived service. A hit refreshes the entry's position, so
  * the evicted entry is the least-recently-USED, never a handle still
  * hot in a registered query. Eviction runs the callback
  * (unpersist/release) on the displaced value. All state is
  * planner-sized: a handful of handles, never data.
  */
final class BoundedMemo[K, V](cap: Int, onEvict: V => Unit = (_: V) => ()) {
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  def getOrElseUpdate(k: K, build: => V): V = synchronized {
    m.remove(k) match {
      case Some(v) =>
        m.put(k, v) // re-insert at the tail: LRU refresh on hit
        v
      case None =>
        val v = build
        m.put(k, v)
        while (m.size > cap) {
          val (ek, ev) = m.head
          m.remove(ek)
          try onEvict(ev) catch { case NonFatal(_) => () }
        }
        v
    }
  }

  def size: Int = synchronized(m.size)

  /** Evict everything (running `onEvict` on each value) — the
    * invalidation hook for callers whose keys can go stale behind
    * their backs (e.g. a file-backed plan whose files were
    * overwritten).
    */
  def clear(): Unit = synchronized {
    m.valuesIterator.foreach(v => try onEvict(v) catch {
      case NonFatal(_) => ()
    })
    m.clear()
  }
}
