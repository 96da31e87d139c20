package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import OracleNum.{dsum, davg}

/** Window/analytic functions plus grouping sets (rollup & cube).
  * Absent from the reference (SURVEY.md §2.4-2.5); expressed with the
  * built-in `Window` spec so Spark plans a single sort-within-partition
  * per window — partitioned by a key (never a global unpartitioned
  * window, which would serialize on one task at 100 TB).
  */
object WindowQueries {
  import Tables.t

  def all: Seq[GQuery] = Seq(

    // rank / row_number: top-3 customers by balance per nation
    GQuery(
      "q24_topk_per_group",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey".asc)
        t(s, dir, "customer")
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"c_nationkey", $"rk".cast("long").as("rk"), $"c_custkey",
            OracleNum.dround($"c_acctbal", 2).as("acctbal"))
      },
      Some(s"""SELECT c_nationkey, CAST(rk AS BIGINT) AS rk, c_custkey,
             |  ${OracleNum.droundSql("c_acctbal", 2)} AS acctbal
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
             |      FROM customer)
             |WHERE rk <= 3""".stripMargin),
      headline = true),

    // running (cumulative) sum per customer ordered by date
    GQuery(
      "q25_running_total",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter($"o_custkey" < 100)
          .select($"o_custkey", $"o_orderkey",
            round(sum($"o_totalprice").over(w), 2).as("running_spent"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent
             |FROM orders WHERE o_custkey < 100""".stripMargin)),

    // lag/lead: day gap between consecutive orders of a customer
    GQuery(
      "q26_order_gaps",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        t(s, dir, "orders")
          .filter($"o_custkey" < 200)
          .select($"o_custkey", $"o_orderkey",
            datediff($"o_orderdate", lag($"o_orderdate", 1).over(w))
              .cast("long").as("days_since_prev"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day',
             |    lag(o_orderdate) OVER (PARTITION BY o_custkey
             |                           ORDER BY o_orderdate, o_orderkey),
             |    o_orderdate) AS BIGINT) AS days_since_prev
             |FROM orders WHERE o_custkey < 200""".stripMargin)),

    // dense_rank + ntile + avg-over-partition analytics
    GQuery(
      "q27_price_analytics",
      (s, dir) => {
        import s.implicits._
        val wOrd = Window.partitionBy($"p_brand")
          .orderBy($"p_retailprice".desc, $"p_partkey".asc)
        val wAll = Window.partitionBy($"p_brand")
        t(s, dir, "part")
          .select($"p_partkey", $"p_brand",
            dense_rank().over(wOrd).cast("long").as("price_rank"),
            ntile(4).over(wOrd).cast("long").as("quartile"),
            round($"p_retailprice" - avg($"p_retailprice").over(wAll), 2)
              .as("diff_from_brand_avg"))
      },
      Some("""SELECT p_partkey, p_brand,
             |  CAST(dense_rank() OVER w AS BIGINT) AS price_rank,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  round(p_retailprice - avg(p_retailprice)
             |        OVER (PARTITION BY p_brand), 2) AS diff_from_brand_avg
             |FROM part
             |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)""".stripMargin)),

    // ROLLUP (hierarchical grouping sets)
    GQuery(
      "q28_rollup_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("revenue"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  sum(floor((l_extendedprice) * 10000 + 0.5)) / 10000 AS revenue
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // CUBE (all grouping-set combinations)
    GQuery(
      "q29_cube_orders",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), davg($"o_totalprice").as("avg_price"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  sum(floor((o_totalprice) * 10000 + 0.5)) / 10000 / count(*) AS avg_price
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // explicit GROUPING SETS (arbitrary set list + grouping() marker);
    // spark.sql text because the set-list form is SQL-only surface
    GQuery(
      "q59_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |  count(*) AS n,
            |  cast(grouping(o_orderstatus) as bigint) AS g_status
            |FROM orders_gs
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
            |""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())""".stripMargin)),

    // top-k per key via the bounded-heap Aggregator (map-side partial
    // merge shuffles ≤k rows per key per partition, vs the window
    // spelling shuffling and sorting every row — q24 is the window
    // twin of this query); oracle = the equivalent window SQL
    GQuery(
      "q60_topk_aggregator",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, explode, udaf}
        val top3 = udaf(new graft.functions.TopKAggregator(3))
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(top3($"o_totalprice", $"o_orderkey").as("top"))
          .select($"o_orderpriority", explode($"top").as("e"))
          .select($"o_orderpriority",
            col("e._2").as("o_orderkey"),
            col("e._1").as("o_totalprice"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3""".stripMargin),
      headline = true),

    // RANGE frame (value-based, not row-based): orders counted within
    // a trailing 30-day window per customer — the frame is defined on
    // the epoch-day VALUE, so gaps in order history shrink the window
    // (a ROWS frame could not express this)
    GQuery(
      "q86_range_window",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val day = datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date"))
        val w = Window.partitionBy($"o_custkey").orderBy($"day")
          .rangeBetween(-30, Window.currentRow)
        t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", day.cast("long").as("day"))
          .withColumn("n_trailing30", count(lit(1)).over(w))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             |  CAST(count(*) OVER (PARTITION BY o_custkey
             |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing30
             |FROM orders""".stripMargin)),

    // distribution-rank window functions (the remaining trio the
    // family above doesn't cover): quartile bucketing via ntile,
    // percent_rank ((rank−1)/(n−1)) and cume_dist (rank/n) per nation,
    // ordered with a unique tiebreak so both engines see one total
    // order. The doubles are integer-ratio divisions — bit-identical
    // cross-engine; the window partitions by nation key (bounded
    // per-partition work at any scale).
    GQuery(
      "q154_rank_distributions",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_nationkey")
          .orderBy($"c_acctbal", $"c_custkey")
        t(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey",
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
      },
      Some("""SELECT c_custkey, c_nationkey,
             |  ntile(4) OVER w AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin)),

    // explicit-frame window surface: first_value / last_value /
    // nth_value and a 3-row sliding sum over per-type DAILY cents
    // series (aggregated first so the windows run over ~30 rows per
    // type, not the event stream). last_value needs the full-partition
    // frame spelled out (the default frame ends at CURRENT ROW — a
    // classic silent-wrong-answer both engines define identically);
    // the sliding sum is over integer cents so the 3-row frame is
    // exact in any order. Scale shape: one (type, day) aggregate
    // shuffle, then type-partitioned windows over day-count rows.
    GQuery(
      "q255_frame_surface",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("cents"))
        val w = Window.partitionBy($"event_type").orderBy($"day")
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val trail3 = w.rowsBetween(-2, Window.currentRow)
        daily.select($"event_type", $"day", $"cents",
          first($"cents").over(w).as("first_cents"),
          last($"cents").over(full).as("last_cents"),
          nth_value($"cents", 2).over(full).as("second_day_cents"),
          sum($"cents").over(trail3).as("cents_3d"))
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |         AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, day, cents,
             |  first_value(cents) OVER w AS first_cents,
             |  last_value(cents) OVER (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |    AS last_cents,
             |  nth_value(cents, 2) OVER (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |    AS second_day_cents,
             |  CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cents_3d
             |FROM d
             |WINDOW w AS (PARTITION BY event_type ORDER BY day)""".stripMargin))
  )
}
