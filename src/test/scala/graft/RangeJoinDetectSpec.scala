package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-detection strategy must (a) fire on the composable inner
  * interval-join spelling, (b) produce exactly the hash-join results,
  * (c) leave every non-matching shape to the built-in planner.
  */
class RangeJoinDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import org.apache.spark.sql.Row

  private def sides: (DataFrame, DataFrame) = {
    import spark.implicits._
    // nulls in keys and times, duplicate keys, empty groups, boundary
    // ties (on == lo excluded, on == hi included)
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"),
      (3L, 500L, "d"), (null, 100L, "e"), (4L, null, "f"))
      .toDF("k", "lo", "ltag")
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "r1"), (1L, 150L, "r2"), (1L, 250L, "r3"),
      (2L, 150L, "r4"), (9L, 150L, "r5"), (null, 150L, "r6"),
      (1L, null, "r7"))
      .toDF("rk", "t", "rtag")
    (left, right)
  }

  private def expected(left: DataFrame, right: DataFrame): Set[Seq[Any]] = {
    // reference result computed driver-side from the collected inputs
    val l = left.collect(); val r = right.collect()
    (for {
      lr <- l; rr <- r
      k = lr.getAs[Any]("k"); rk = rr.getAs[Any]("rk")
      lo = lr.getAs[Any]("lo"); t = rr.getAs[Any]("t")
      if k != null && k == rk && lo != null && t != null &&
        t.asInstanceOf[Long] > lo.asInstanceOf[Long] &&
        t.asInstanceOf[Long] <= lo.asInstanceOf[Long] + 100L
    } yield lr.toSeq ++ rr.toSeq).map(_.toVector: Seq[Any]).toSet
  }

  test("the composable spelling plans as RangeJoin and matches the hash join") {
    val (left, right) = sides
    val joined = left.join(right,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"expected auto-detected merge in:\n$plan")
    assert(!plan.contains("HashJoin") && !plan.contains("SortMergeJoinExec"),
      s"unexpected pair-materializing join in:\n$plan")
    assert(joined.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
      expected(left, right))
  }

  test("swapped sides (bounds on the right) detect and restore column order") {
    val (left, right) = sides
    val joined = right.join(left,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"expected auto-detected merge in:\n$plan")
    assert(joined.columns.toSeq == Seq("rk", "t", "rtag", "k", "lo", "ltag"))
    val want = expected(left, right)
      .map { s => s.drop(3) ++ s.take(3) } // right cols first
    assert(joined.collect().map(_.toSeq.toVector: Seq[Any]).toSet == want)
  }

  test("non-matching shapes stay on the built-in planner") {
    val (left, right) = sides
    // no upper bound
    val open = left.join(right,
      col("k") === col("rk") && col("t") > col("lo"))
    assert(!open.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // strict upper bound (shape is (lo, hi), not (lo, hi])
    val strict = left.join(right,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") < col("lo") + lit(100L))
    assert(!strict.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // swapped left-outer (bounds on the inner side) can't be a merge
    // left-outer — stays on the built-in planner
    val outerSwapped = right.join(left,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(100L), "left_outer")
    assert(!outerSwapped.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // an extra TWO-SIDED conjunct can't be pushed out of the join
    // condition, so the shape no longer matches (a single-side extra
    // predicate, by contrast, pushes into the child and detection
    // still fires — the desired plan)
    val extra = left.join(right,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(100L) && col("rtag") =!= col("ltag"))
    assert(!extra.queryExecution.executedPlan.toString.contains("RangeJoin"))
    val pushable = left.join(right,
      col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(100L) && col("rtag") =!= lit("r2"))
    assert(pushable.queryExecution.executedPlan.toString.contains("RangeJoin"))
    assert(pushable.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
      expected(left, right).filterNot(_.last == "r2"))
  }

  test("auto-detected merge equals the hash join on random data (10 rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    for (round <- 0 until 10) {
      def maybeNull(v: Long): java.lang.Long =
        if (rnd.nextInt(10) == 0) null else Long.box(v)
      val l = Seq.fill(30 + rnd.nextInt(40))(
        (maybeNull(rnd.nextInt(6).toLong), maybeNull(rnd.nextInt(1000).toLong)))
        .zipWithIndex.map { case ((k, lo), i) => (k, lo, i.toLong) }
        .toDF("k", "lo", "lid")
      val r = Seq.fill(30 + rnd.nextInt(40))(
        (maybeNull(rnd.nextInt(6).toLong), maybeNull(rnd.nextInt(1200).toLong)))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("rk", "t", "rid")
      val w = 50L + rnd.nextInt(300)
      val cond = col("k") === col("rk") && col("t") > col("lo") &&
        col("t") <= col("lo") + lit(w)
      val auto = l.join(r, cond)
      assert(auto.queryExecution.executedPlan.toString.contains("RangeJoin"))
      val base = l.join(broadcast(r), cond) // hint disables detection
      val a = auto.select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val b = base.select($"lid", $"rid").as[(Long, Long)].collect().toSet
      assert(a == b, s"round $round (w=$w): ${a.diff(b)} vs ${b.diff(a)}")
    }
  }

  test("the left-outer spelling maps onto the exec directly") {
    val (left, right) = sides
    val cond = col("k") === col("rk") && col("t") > col("lo") &&
      col("t") <= col("lo") + lit(100L)
    val outer = left.join(right, cond, "left_outer")
    val plan = outer.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"),
      s"expected the left-outer spelling to go native in:\n$plan")
    val base = left.join(broadcast(right), cond, "left_outer")
    assert(!base.queryExecution.executedPlan.toString.contains("RangeJoin"))
    assert(outer.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
      base.collect().map(_.toSeq.toVector: Seq[Any]).toSet)
  }

  test("SQL-text interval joins reach the native exec (q136)") {
    val df = SparkEntry.queries("q136_sql_interval_native")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"),
      s"expected the SQL front door to auto-detect in:\n$plan")
  }

  test("the spelled q37 shape (inner variant) goes native end to end") {
    import spark.implicits._
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id",
        unix_micros($"ts").as("sts"))
    val follow = ev.select($"user_id".as("fu"), $"event_id".as("fid"),
      unix_micros($"ts").as("fts"))
    val spelled = signups.join(follow,
        $"user_id" === $"fu" && $"fts" > $"sts" &&
          $"fts" <= $"sts" + 3600L * 1000000L)
      .groupBy($"signup_id", $"user_id")
      .agg(count($"fid").as("n_follow"))
    assert(spelled.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // differential vs the same query with the detection disabled via a
    // broadcast hint (hints make the strategy bail)
    val hinted = signups.join(broadcast(follow),
        $"user_id" === $"fu" && $"fts" > $"sts" &&
          $"fts" <= $"sts" + 3600L * 1000000L)
      .groupBy($"signup_id", $"user_id")
      .agg(count($"fid").as("n_follow"))
    assert(!hinted.queryExecution.executedPlan.toString.contains("RangeJoin"))
    assert(spelled.collect().map(_.toSeq).toSet ==
      hinted.collect().map(_.toSeq).toSet)
  }
}
