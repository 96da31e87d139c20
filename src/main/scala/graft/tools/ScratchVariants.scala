package graft.tools

import graft.Tables.t
import graft.scale.GuardedBroadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch-only A/B variants for optimization experiments (round 15).
  * NOT part of the registry / driver contract — candidate plan shapes
  * are timed here against the registered originals in one warm JVM,
  * and only measured winners graduate into the real query code.
  */
object ScratchVariants {

  /** q03 with the fact as the STREAM side: the cust⋈ord intermediate
    * is measured by GuardedBroadcast and broadcast only when it is
    * actually small — never a hash build over lineitem.
    */
  def q03x(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
    val co = cust.join(ord, $"c_custkey" === $"o_custkey")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(GuardedBroadcast.maybe(co), $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(graft.queries.OracleNum.dsum(
        $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  /** q04 with the EXISTS collapsed to an orderkey-grain max aggregate:
    * EXISTS(l_shipdate > o_orderdate) ⟺ max(l_shipdate) > o_orderdate.
    */
  def q04x(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val maxShip = t(s, dir, "lineitem")
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("max_ship"))
    t(s, dir, "orders")
      .join(GuardedBroadcast.maybe(maxShip),
        $"o_orderkey" === $"l_orderkey" && $"max_ship" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** q08 with the fact as the STREAM side of its first big join. */
  def q08x(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val reg = t(s, dir, "region")
    val nat = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val co = cust.join(ord, $"c_custkey" === $"o_custkey")
      .select($"o_orderkey", $"c_nationkey")
    li.join(GuardedBroadcast.maybe(co), $"o_orderkey" === $"l_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(GuardedBroadcast.maybe(nat), $"s_nationkey" === $"n_nationkey")
      .join(GuardedBroadcast.maybe(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(graft.queries.OracleNum.dsum(
        $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  /** q67 with the COUNT(DISTINCT) split from the imperative sketch
    * aggregates: the distinct rewrite keys phase 1 by (flag, orderkey)
    * and would otherwise replicate the percentile value-map / t-digest
    * / HLL buffers across every one of those groups and through two
    * exchanges.
    */
  def q67x(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rsd = 0.01
    val li = t(s, dir, "lineitem")
    val exactD = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact_orders"))
    val sketches = li.groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", rsd = rsd).as("approx_orders"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_median"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))
    exactD.join(GuardedBroadcast.maybe(sketches), Seq("l_returnflag"))
      .select($"l_returnflag", $"exact_orders", $"exact_median",
        (abs($"approx_orders" - $"exact_orders") <=
          $"exact_orders" * (5 * rsd)).as("hll_ok"),
        (abs($"approx_median" - $"exact_median") <=
          $"exact_median" * 0.01).as("tdigest_ok"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q03x_fact_stream" -> q03x,
    "q04x_max_agg" -> q04x,
    "q08x_fact_stream" -> q08x,
    "q67x_split_distinct" -> q67x)
}
