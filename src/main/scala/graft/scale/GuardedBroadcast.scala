package graft.scale

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Runtime guard for "this relation is small enough to broadcast"
  * arguments. A threshold-bounded or burst-sized relation usually IS
  * small — but an unconditional `broadcast()` hint turns a broken
  * bound assumption into an executor OOM at 100 TB. `maybe` measures
  * the relation once (one aggregate over the persisted set: row count
  * × schema width plus actual string/binary/array payload) and applies
  * the hint only under `spark.sql.autoBroadcastJoinThreshold`; above
  * it, the join falls back to a plain shuffle join — safe by
  * construction, merely slower.
  *
  * The measurement job is one scan of a relation the caller already
  * computes (and that stays persisted for the actual join), so the
  * guard costs one cheap job, not a recompute.
  */
object GuardedBroadcast {

  /** Conservative per-row on-heap estimate mirroring how Spark sizes
    * broadcast relations: fixed 16-byte row overhead plus per-field
    * width; variable-width fields measure their actual payload.
    */
  private def rowBytes(schema: StructType): org.apache.spark.sql.Column =
    schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          coalesce(length(col(f.name)).cast("long"), lit(0L)) + 20L
        case BinaryType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + 20L
        case ArrayType(_, _) =>
          coalesce(size(col(f.name)).cast("long"), lit(0L)) * 16L + 20L
        case _ => lit(16L)
      }
    }.foldLeft(lit(16L): org.apache.spark.sql.Column)(_ + _)

  /** `broadcast(df)` when the measured size fits under the session's
    * autoBroadcastJoinThreshold, `df` unchanged otherwise (threshold
    * −1 = broadcast disabled = never hint).
    */
  def maybe(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thresholdBytes =
      try JavaUtils.byteStringAsBytes(thr) catch { case _: Exception => -1L }
    if (thresholdBytes <= 0) return df
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val measured = cached.select(sum(rowBytes(df.schema)).as("b"))
      .head.getAs[Any]("b") match {
        case null => 0L
        case b: Long => b
      }
    if (measured <= thresholdBytes) broadcast(cached) else cached
  }
}
