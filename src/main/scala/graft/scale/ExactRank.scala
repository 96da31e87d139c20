package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row_number WITHOUT a global single-task sort — q233's
  * banded exact-rank pattern (value-histogram prefix sum + within-band
  * row_number, `queries/TextQueries.scala`) generalized to value
  * domains that are NOT bounded (money totals, event counts, float
  * scores), where a literal value histogram would itself be data-sized.
  *
  * The total order is `(value ASC, h ASC, tie ASC)` where `h` is a
  * uniformly-distributed deterministic long the caller derives from the
  * unique tie column (use [[ExactRank.h32]] — the repo's md5-prefix
  * recipe, exactly mirrorable in the DuckDB oracle). The global rank of
  * a row decomposes lexicographically into four all-partitioned terms:
  *
  *   1. rows in strictly smaller VALUE BANDS — bands are ~equi-depth
  *      ranges cut at `approx_percentile` boundaries, materialized ONCE
  *      at plan-construction time (a `bands`-sized driver value, the
  *      same schema-scale probe discipline as [[GuardedBroadcast]]'s
  *      measurement pass). ANY monotone banding yields the same exact
  *      rank — the boundaries only steer load balance, so the sketch's
  *      approximation is harmless. The band histogram is `bands`-sized
  *      and its prefix sum runs under [[BoundedWindow]].
  *   2. same band, strictly smaller value — a prefix sum over DISTINCT
  *      values within the band (value-group grain, ≈ distinct/bands
  *      rows per task).
  *   3. same value, smaller h sub-band — ties on the exact value are
  *      split 256 ways by the top bits of `h` (monotone in `h`, so the
  *      (value, h, tie) order is preserved); the (value, sub-band)
  *      histogram prefix-sums within each value over ≤ 256 rows.
  *   4. `row_number` within (value, h-sub-band) ordered by (h, tie) —
  *      the only data-grain window, and its partitions are at most
  *      one-256th of the hottest tie group.
  *
  * This is the same shape a range-partitioned distributed sort gives
  * (sampled boundaries + per-partition offsets), expressed in DataFrame
  * algebra so every stage keeps codegen and stays declarative for
  * Catalyst. Cost: one percentile pass + two group-grain joins instead
  * of one window — the price of never materializing a single-task sort
  * over data-grain rows. `bands` is the cluster-parallelism knob.
  *
  * Caller contract: `value`, `h`, `tie` must be non-null on every row;
  * `(value, h, tie)` must be unique (give `tie` a unique key). For a
  * DESC value order pass the negated column and mirror the DESC in the
  * oracle's ORDER BY.
  */
object ExactRank {

  /** The repo's deterministic 32-bit uniform hash (md5 first 8 hex
    * digits), identical in Spark and DuckDB — the DuckDB twin is
    * `CAST(concat('0x', substr(md5(concat(CAST(<id> AS VARCHAR),
    * '<salt>')), 1, 8)) AS BIGINT)`.
    */
  def h32(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))
      .cast("binary")), 1, 8), 16, 10).cast("long")

  /** Exact integral division for non-negative operands. `(a - a % b)`
    * is an exact multiple of `b`, so the double divide is exact for
    * every quotient below 2^53 — far past any row count or rank.
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** SQL `ntile(n)` bucket from an exact 1-based rank and the total row
    * count — the standard formula (the first `total % n` buckets get
    * one extra row), spelled explicitly so the Spark side and the
    * DuckDB oracle share arithmetic instead of trusting two engines'
    * `ntile` to tie-break identically. Mirror with [[ntileSql]].
    */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    val q = intDiv(total, lit(n))
    val rem = total % n
    when(rank <= (q + 1) * rem, intDiv(rank + q, q + 1))
      .otherwise(rem + intDiv(rank - rem * (q + 1) + q - 1, q))
      .cast("long")
  }

  /** DuckDB twin of [[ntileFromRank]] over SQL expressions `rk` and
    * `total`.
    */
  def ntileSql(rk: String, total: String, n: Int): String =
    s"CASE WHEN $rk <= ($total // $n + 1) * ($total % $n) " +
      s"THEN ($rk + $total // $n) // ($total // $n + 1) " +
      s"ELSE $total % $n + ($rk - ($total % $n) * ($total // $n + 1) " +
      s"+ $total // $n - 1) // ($total // $n) END"

  /** The reusable core (terms 1+2 of the decomposition, and a
    * standalone primitive for rank-free selection math): given a
    * relation already at (grp..., value)-GROUP grain with a row-count
    * column `cnt`, adds `out` = rows in my group-scope with a strictly
    * smaller value. With `grp` empty the scope is global. Every window
    * is partitioned — by (grp, band) for the in-band value prefix, by
    * grp (or [[BoundedWindow]] when global) for the `bands`-sized band
    * histogram prefix.
    *
    * Group-grain `below` is enough for any per-value-group statistic:
    * a tie group with count c occupies ranks below+1 … below+c, so
    * k-th selection (exact median: q248), rank-weighted sums (Gini's
    * Σi·xᵢ: q263), and tie-averaged rank sums (AUC: q291) all reduce
    * to closed forms over (value, cnt, below) — no per-row rank, no
    * tiebreak column, no data-grain window at all.
    */
  def belowCounts(
      grouped: DataFrame,
      grp: Seq[String],
      value: String,
      cnt: String,
      out: String,
      bands: Int = 256): DataFrame = {
    // ~equi-depth boundaries: one `bands`-sized driver row, computed
    // once so every downstream use of the banding is consistent by
    // construction. Percentile cut points (over the group-grain
    // relation, which is what the windows run on) keep band loads
    // balanced regardless of the value distribution — a fixed-width
    // histogram would let one hot value range defeat the banding.
    // Boundaries are GLOBAL even when grp is set: banding only needs
    // to be monotone in the value, and every window below is
    // grp-scoped anyway.
    val pts = (1 until bands).map(i => i.toDouble / bands).mkString(", ")
    val bRow = grouped
      .agg(expr(s"approx_percentile($value, array($pts), 10000)").as("b"))
      .head()
    val boundsSeq: Seq[Any] =
      if (bRow.isNullAt(0)) Nil else bRow.getSeq[Any](0)
    val bandCol = boundsSeq.foldLeft(lit(0): Column)((acc, b) =>
      acc + when(col(value) > lit(b), 1).otherwise(0))
    val banded = grouped.withColumn("_erk_band", bandCol)
    val gCols = grp.map(col)
    val unb = Window.unboundedPreceding
    val wband =
      if (grp.isEmpty) BoundedWindow.ordered(col("_erk_band"))
      else Window.partitionBy(gCols: _*).orderBy(col("_erk_band"))
    val bandHist = banded
      .groupBy((gCols :+ col("_erk_band")): _*)
      .agg(sum(col(cnt)).as("_erk_bc"))
      .withColumn("_erk_below_band", coalesce(
        sum(col("_erk_bc")).over(wband.rowsBetween(unb, -1)), lit(0L)))
      .select((gCols :+ col("_erk_band") :+ col("_erk_below_band")): _*)
    val wv = Window.partitionBy((gCols :+ col("_erk_band")): _*)
      .orderBy(col(value)).rowsBetween(unb, -1)
    banded
      // unhinted on purpose: bandHist is ≤ `bands` (× group) rows BY
      // CONSTRUCTION, so AQE broadcasts it from its measured shuffle
      // size — a GuardedBroadcast here would spend a persist+measure
      // job per call to learn what the bound already guarantees
      .join(bandHist, grp :+ "_erk_band")
      .withColumn(out,
        col("_erk_below_band") + coalesce(sum(col(cnt)).over(wv), lit(0L)))
      .drop("_erk_band", "_erk_below_band")
  }

  /** Adds `out` = exact global row_number under (value, h, tie) ASC.
    * All other columns pass through unchanged.
    */
  def rowNumber(
      df: DataFrame,
      value: Column,
      h: Column,
      tie: Column,
      out: String,
      bands: Int = 256): DataFrame = {
    // NOT pinned here: a caller chaining several ranks (q254) would
    // pin each growing intermediate and blow the guard memo's LRU cap
    // into eviction thrash (measured: 2.4x slower than no caching).
    // Callers with an expensive upstream pin their INPUT once
    // (GuardedBroadcast.pin) — every pass then recomputes only the
    // cheap column adds below over the cached relation.
    val base = df
      .withColumn("_erk_v", value)
      .withColumn("_erk_h", h)
      .withColumn("_erk_t", tie)
      // h sub-band = top 8 of the 32 hash bits: monotone in h, so
      // (value, hb, h, tie) is still the (value, h, tie) order.
      .withColumn("_erk_hb", shiftright(col("_erk_h"), 24).cast("int"))
    // terms 1+2: rows with a strictly smaller value (banded, global).
    val valuePre = belowCounts(
      base.groupBy(col("_erk_v")).agg(count(lit(1)).as("_erk_vc")),
      Nil, "_erk_v", "_erk_vc", "_erk_below_v", bands)
      .select(col("_erk_v"), col("_erk_below_v"))
    val unb = Window.unboundedPreceding
    // term 3: same value, smaller h sub-band (≤ 256 rows per value).
    val wh = Window.partitionBy(col("_erk_v")).orderBy(col("_erk_hb"))
      .rowsBetween(unb, -1)
    val hbPre = base.groupBy(col("_erk_v"), col("_erk_hb"))
      .agg(count(lit(1)).as("_erk_hc"))
      .withColumn("_erk_below_hb",
        coalesce(sum(col("_erk_hc")).over(wh), lit(0L)))
      .select(col("_erk_v"), col("_erk_hb"), col("_erk_below_hb"))
    // term 4: row_number within (value, h sub-band) — the only
    // data-grain window; partitions are ≤ hottest-tie-group/256.
    val wrow = Window.partitionBy(col("_erk_v"), col("_erk_hb"))
      .orderBy(col("_erk_h"), col("_erk_t"))
    base
      .join(GuardedBroadcast.maybe(valuePre), Seq("_erk_v"))
      .join(GuardedBroadcast.maybe(hbPre), Seq("_erk_v", "_erk_hb"))
      .withColumn(out,
        (col("_erk_below_v") + col("_erk_below_hb") +
          row_number().over(wrow)).cast("long"))
      .drop("_erk_v", "_erk_h", "_erk_t", "_erk_hb",
        "_erk_below_v", "_erk_below_hb")
  }
}
