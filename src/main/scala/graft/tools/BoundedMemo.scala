package graft.tools

/** Insertion-ordered memo with a hard entry cap — the driver-side
  * caches for derived artifacts (persisted DataFrames, GraphX graphs,
  * store handles) are keyed by (session, dataset) and would otherwise
  * grow without bound in a long-lived service. Eviction runs the
  * callback (unpersist/release) on the displaced value. All state is
  * planner-sized: a handful of handles, never data.
  */
final class BoundedMemo[K, V](cap: Int, onEvict: V => Unit = (_: V) => ()) {
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  def getOrElseUpdate(k: K, build: => V): V = synchronized {
    m.get(k) match {
      case Some(v) => v
      case None =>
        val v = build
        m.put(k, v)
        while (m.size > cap) {
          val (ek, ev) = m.head
          m.remove(ek)
          try onEvict(ev) catch { case _: Throwable => () }
        }
        v
    }
  }

  def size: Int = synchronized(m.size)
}
