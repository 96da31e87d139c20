package graft.scale

import graft.tools.BoundedMemo
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
  * construction, merely slower. A schema the estimator can't measure
  * conservatively (maps, structs, nested arrays) never gets the hint
  * at all: an under-measured relation broadcasting oversized is the
  * exact failure the guard exists to prevent.
  *
  * The measurement job is one scan of a relation the caller already
  * computes (and that stays persisted for the actual join), so the
  * guard costs one cheap job — and only once per distinct plan: the
  * persisted handle and its measured size live in a [[BoundedMemo]]
  * keyed by the canonicalized logical plan, so re-registering the same
  * query (a bench rerun, a long-lived service) reuses the cached copy,
  * and eviction from the capped memo unpersists it instead of leaking
  * one cache entry per invocation for the session lifetime.
  */
object GuardedBroadcast {

  // planner-sized: a handful of persisted guard relations; LRU
  // eviction unpersists the displaced handle. The key carries the
  // output column NAMES alongside the canonicalized plan —
  // canonicalization normalizes aliases away, and two renamings of
  // the same relation must not share a cached handle.
  private val memo =
    new BoundedMemo[(SparkSession, Seq[String], LogicalPlan), (DataFrame, Long)](
      32, { case (df, _) => df.unpersist() })

  /** Fixed on-heap width for types whose payload the schema fully
    * determines; None for variable or nested types.
    */
  private def fixedWidth(dt: DataType): Option[Int] = dt match {
    case _: NumericType | BooleanType | DateType | TimestampType |
        TimestampNTZType => Some(math.max(8, dt.defaultSize))
    case _ => None
  }

  /** Conservative per-row on-heap estimate mirroring how Spark sizes
    * broadcast relations: fixed 16-byte row overhead plus per-field
    * width; variable-width fields measure their actual payload. None
    * when any field can't be measured conservatively — the caller
    * then skips the hint entirely.
    */
  private def rowBytes(schema: StructType): Option[Column] = {
    val widths = schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          Some(coalesce(length(col(f.name)).cast("long"), lit(0L)) + 20L)
        case BinaryType =>
          Some(coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + 20L)
        // element payload must be schema-bounded: an Array[String] (or
        // nested array) measures None and the relation never gets the hint
        case ArrayType(et, _) => fixedWidth(et).map(w =>
          coalesce(size(col(f.name)).cast("long"), lit(0L)) * w.toLong + 20L)
        case dt => fixedWidth(dt).map(_ => lit(16L): Column)
      }
    }
    if (widths.exists(_.isEmpty)) None
    else Some(widths.flatten.foldLeft(lit(16L): Column)(_ + _))
  }

  /** `broadcast(df)` when the measured size fits under the session's
    * autoBroadcastJoinThreshold, `df` (persisted) otherwise; `df`
    * untouched when broadcasting is disabled (threshold −1) or the
    * schema is unmeasurable.
    */
  def maybe(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thresholdBytes =
      try JavaUtils.byteStringAsBytes(thr) catch { case _: Exception => -1L }
    if (thresholdBytes <= 0) return df
    rowBytes(df.schema) match {
      case None => df
      case Some(bytesExpr) =>
        val key = (df.sparkSession, df.schema.fieldNames.toSeq,
          df.queryExecution.analyzed.canonicalized)
        val (cached, measured) = memo.getOrElseUpdate(key, {
          val c = df.persist(StorageLevel.MEMORY_AND_DISK)
          val m = c.select(sum(bytesExpr).as("b"))
            .head.getAs[Any]("b") match {
              case null => 0L
              case b: Long => b
            }
          (c, m)
        })
        if (measured <= thresholdBytes) broadcast(cached) else cached
    }
  }

  /** Persist-and-memoize WITHOUT the broadcast hint: the caching half
    * of [[maybe]] for a relation a multi-pass operator re-reads
    * several times in one plan family (ExactRank's percentile probe,
    * histogram aggregates, and final joins all scan the same ranked
    * input — unpinned, each pass would recompute the whole upstream
    * chain). Shares the same bounded memo (so eviction unpersists),
    * keyed by the same canonicalized plan; the sentinel size keeps a
    * later [[maybe]] on the identical plan from ever broadcasting the
    * pinned copy — conservative, never wrong.
    */
  def pin(df: DataFrame): DataFrame = {
    val key = (df.sparkSession, df.schema.fieldNames.toSeq,
      df.queryExecution.analyzed.canonicalized)
    val (cached, _) = memo.getOrElseUpdate(key,
      (df.persist(StorageLevel.MEMORY_AND_DISK), Long.MaxValue))
    cached
  }

  /** Visible for tests: current number of memoized guard relations. */
  def memoSize: Int = memo.size

  /** TorrentBroadcast a BOUNDED driver-side VALUE (a directive table,
    * a prefix map — things a schema-sized collect already capped) —
    * the non-DataFrame sibling of [[maybe]]. The serialized size is
    * measured and guarded here, so a value that silently outgrew its
    * caller's bound fails LOUDLY at broadcast time instead of as an
    * executor OOM or a per-task closure-shipping storm.
    */
  def boundedValue[T: scala.reflect.ClassTag](
      spark: org.apache.spark.sql.SparkSession, v: T, what: String,
      maxBytes: Long = 64L * 1024 * 1024)
      : org.apache.spark.broadcast.Broadcast[T] = {
    val bytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val oo = new java.io.ObjectOutputStream(bo)
      oo.writeObject(v); oo.close()
      bo.size().toLong
    }
    require(bytes <= maxBytes,
      s"$what serializes to $bytes bytes (> $maxBytes): not a bounded " +
        "value — this belongs in a relation, not a broadcast")
    spark.sparkContext.broadcast(v)
  }
}
