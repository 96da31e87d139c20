package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional scan pruning.
  *
  * A table sorted on one column prunes row groups only for predicates on
  * that column; a 2-D box predicate on anything else reads everything.
  * Interleaving the bits of two dimensions into one sort key makes every
  * written file cover a small square in (a, b) space, so parquet
  * row-group/file min-max stats prune BOTH dimensions of a box query —
  * the lakehouse layout trick (Delta/Iceberg `ZORDER BY`), built here
  * from plain codegen'd shift/mask arithmetic. Absent from the
  * reference, which has no storage layout layer at all (its one scan is
  * an mmap'd triple file, QueryPlanner.c:173-210).
  *
  * Scale notes: `repartitionByRange` samples the z-value to place range
  * boundaries (one extra lightweight job) and gives each output task a
  * contiguous z-range — at 100 TB pick `files` so a file is a few GB,
  * exactly like the q188 shard sizing. The z-value itself never hits
  * disk; the persisted columns and their parquet stats are unchanged.
  */
object ZOrder {

  /** Bit-interleaved Morton value of two non-negative integer columns
    * (`a` in even bit positions, `b` in odd). Values must fit in `bits`
    * bits — callers quantize wider domains first (bucket ids, not raw
    * keys). Composed from shift/mask `Column` arithmetic so it stays
    * inside whole-stage codegen.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet clustered on the z-order of (`a`, `b`):
    * range-partition into `files` contiguous z-slices, sort each slice,
    * drop the transient z column. Each output file then spans a narrow
    * range of BOTH `a` and `b`, which is what downstream min-max
    * pruning needs.
    */
  def writeZClustered(df: DataFrame, a: String, b: String, bits: Int,
      path: String, files: Int): Unit = {
    val z = df.withColumn("__z", zvalue(col(a), col(b), bits))
    z.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
