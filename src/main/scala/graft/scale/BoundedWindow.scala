package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.udf

/** The deliberate single-partition window.
  *
  * A `Window.orderBy(...)` with no partition spec makes Spark move every
  * row to ONE task (`WindowExec` logs `No Partition Defined` and plans a
  * `SinglePartition` exchange) — correct, but a scale killer whenever
  * the windowed relation grows with the data. This repo's discipline is
  * therefore: a global ordered window is legal ONLY over a relation
  * whose size is bounded by something other than the data volume — a
  * value-domain histogram (q233's n_chars bands), a calendar grain
  * (days), a band count (q95/q205's `doc_id div 100` packing bands), a
  * partition-count offset table. Those windows come through THIS
  * factory, which partitions by a constant: the plan is still the
  * single partition the bounded relation wants, but the choice is
  * explicit in source, greppable, and distinguishable from an
  * accidental global sort — `WindowSpecSpec` pins that `Window.orderBy(`
  * (the accidental form) never appears in `src/main`, and plan-walks
  * every registry query asserting no empty-partition window nodes
  * survive to the optimized plan.
  *
  * Data-grain ranking (exact global row_number / ntile over rows that
  * scale with the corpus) must NOT use this; that is [[ExactRank]]'s
  * job.
  */
object BoundedWindow {

  // A literal partition key gets constant-folded OUT of the window
  // spec by the optimizer, silently reverting to the warning-logging
  // empty-spec form — so the constant is a deterministic, non-foldable
  // UDF the optimizer must keep. Evaluates to the same value on every
  // row, so the plan is still exactly the single-partition exchange
  // the bounded relation wants.
  private val singleton = udf(() => 1)

  /** Ordered window over a provably bounded relation (see object doc).
    * Chain `.rowsBetween`/`.rangeBetween` for frames as usual.
    */
  def ordered(cols: Column*): WindowSpec =
    Window.partitionBy(singleton()).orderBy(cols: _*)

  /** Unordered whole-relation frame (a windowed grand total) over a
    * provably bounded relation — the `partitionBy(lit(1))` intent,
    * spelled so the optimizer can't fold the key back to the
    * empty-spec warning form.
    */
  def all: WindowSpec = Window.partitionBy(singleton())
}
