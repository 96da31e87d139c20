package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-detection strategy must (a) fire on the composable inner
  * interval-join spelling in EVERY endpoint convention, (b) produce
  * exactly the hash-join results, (c) leave every non-matching shape
  * to the built-in planner, and (d) bail to the built-in broadcast
  * plan when a side is broadcast-tiny — so most plan assertions run
  * with broadcasting disabled, the regime where the merge is the
  * right plan at any size.
  */
class RangeJoinDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import org.apache.spark.sql.Row

  /** Detection bails under autoBroadcastJoinThreshold; local fixtures
    * are all tiny, so plan assertions disable broadcasting (and
    * restore it — the session is shared across suites).
    */
  private def noBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  private def sides: (DataFrame, DataFrame) = {
    import spark.implicits._
    // nulls in keys and times, duplicate keys, empty groups, boundary
    // ties (rows AT lo and AT hi make endpoint inclusivity observable)
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"),
      (3L, 500L, "d"), (null, 100L, "e"), (4L, null, "f"))
      .toDF("k", "lo", "ltag")
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "r1"), (1L, 150L, "r2"), (1L, 250L, "r3"),
      (1L, 300L, "r4"), (2L, 150L, "r5"), (9L, 150L, "r6"),
      (null, 150L, "r7"), (1L, null, "r8"))
      .toDF("rk", "t", "rtag")
    (left, right)
  }

  private def expected(left: DataFrame, right: DataFrame,
      loIncl: Boolean, hiIncl: Boolean): Set[Seq[Any]] = {
    // reference result computed driver-side from the collected inputs
    val l = left.collect(); val r = right.collect()
    (for {
      lr <- l; rr <- r
      k = lr.getAs[Any]("k"); rk = rr.getAs[Any]("rk")
      lo = lr.getAs[Any]("lo"); t = rr.getAs[Any]("t")
      if k != null && k == rk && lo != null && t != null && {
        val tv = t.asInstanceOf[Long]; val lov = lo.asInstanceOf[Long]
        (tv > lov || (loIncl && tv == lov)) &&
          (tv < lov + 100L || (hiIncl && tv == lov + 100L))
      }
    } yield lr.toSeq ++ rr.toSeq).map(_.toVector: Seq[Any]).toSet
  }

  private def cond(loIncl: Boolean, hiIncl: Boolean) = {
    val lower = if (loIncl) col("t") >= col("lo") else col("t") > col("lo")
    val hi = col("lo") + lit(100L)
    val upper = if (hiIncl) col("t") <= hi else col("t") < hi
    col("k") === col("rk") && lower && upper
  }

  test("the composable spelling plans as RangeJoin and matches the hash join") {
    noBroadcast {
      val (left, right) = sides
      val joined = left.join(right, cond(loIncl = false, hiIncl = true))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("RangeJoin"), s"expected auto-detected merge in:\n$plan")
      assert(!plan.contains("HashJoin") && !plan.contains("SortMergeJoinExec"),
        s"unexpected pair-materializing join in:\n$plan")
      assert(joined.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
        expected(left, right, loIncl = false, hiIncl = true))
    }
  }

  test("all four endpoint conventions plan native and match the hash join") {
    noBroadcast {
      val (left, right) = sides
      for (loIncl <- Seq(false, true); hiIncl <- Seq(false, true)) {
        val auto = left.join(right, cond(loIncl, hiIncl))
        val plan = auto.queryExecution.executedPlan.toString
        assert(plan.contains("RangeJoin"),
          s"loIncl=$loIncl hiIncl=$hiIncl expected native merge in:\n$plan")
        val want = expected(left, right, loIncl, hiIncl)
        assert(auto.collect().map(_.toSeq.toVector: Seq[Any]).toSet == want,
          s"loIncl=$loIncl hiIncl=$hiIncl")
        // the broadcast HINT disables detection: differential baseline
        val base = left.join(broadcast(right), cond(loIncl, hiIncl))
        assert(!base.queryExecution.executedPlan.toString.contains("RangeJoin"))
        assert(base.collect().map(_.toSeq.toVector: Seq[Any]).toSet == want)
      }
    }
  }

  test("swapped sides (bounds on the right) detect and restore column order") {
    noBroadcast {
      val (left, right) = sides
      val joined = right.join(left, cond(loIncl = false, hiIncl = true))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("RangeJoin"), s"expected auto-detected merge in:\n$plan")
      assert(joined.columns.toSeq == Seq("rk", "t", "rtag", "k", "lo", "ltag"))
      val want = expected(left, right, loIncl = false, hiIncl = true)
        .map { s => s.drop(3) ++ s.take(3) } // right cols first
      assert(joined.collect().map(_.toSeq.toVector: Seq[Any]).toSet == want)
    }
  }

  test("non-matching shapes stay on the built-in planner") {
    noBroadcast {
      val (left, right) = sides
      // no upper bound
      val open = left.join(right,
        col("k") === col("rk") && col("t") > col("lo"))
      assert(!open.queryExecution.executedPlan.toString.contains("RangeJoin"))
      // two lower bounds, no upper
      val twoLo = left.join(right,
        col("k") === col("rk") && col("t") > col("lo") &&
          col("t") >= col("lo") - lit(5L))
      assert(!twoLo.queryExecution.executedPlan.toString.contains("RangeJoin"))
      // swapped left-outer (bounds on the inner side) can't be a merge
      // left-outer — stays on the built-in planner
      val outerSwapped = right.join(left,
        cond(loIncl = false, hiIncl = true), "left_outer")
      assert(!outerSwapped.queryExecution.executedPlan.toString.contains("RangeJoin"))
      // an extra TWO-SIDED conjunct can't be pushed out of the join
      // condition, so the shape no longer matches (a single-side extra
      // predicate, by contrast, pushes into the child and detection
      // still fires — the desired plan)
      val extra = left.join(right,
        cond(loIncl = false, hiIncl = true) && col("rtag") =!= col("ltag"))
      assert(!extra.queryExecution.executedPlan.toString.contains("RangeJoin"))
      val pushable = left.join(right,
        cond(loIncl = false, hiIncl = true) && col("rtag") =!= lit("r2"))
      assert(pushable.queryExecution.executedPlan.toString.contains("RangeJoin"))
      assert(pushable.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
        expected(left, right, loIncl = false, hiIncl = true)
          .filterNot(_.last == "r2"))
    }
  }

  test("a broadcast-tiny side keeps the built-in broadcast plan") {
    // default threshold (10MB) in force: these six-row sides are far
    // under it, so detection bails and JoinSelection broadcasts —
    // cheaper than two exchanges + two sorts for small inputs
    val (left, right) = sides
    val joined = left.join(right, cond(loIncl = false, hiIncl = true))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("RangeJoin"),
      s"expected the small-side bail-out to keep the built-in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join for a tiny side:\n$plan")
    assert(joined.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
      expected(left, right, loIncl = false, hiIncl = true))
  }

  test("auto-detected merge equals the hash join on random data, " +
      "all conventions (12 rounds)") {
    noBroadcast {
      import spark.implicits._
      val rnd = new scala.util.Random(99L)
      for (round <- 0 until 12) {
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
        val (loIncl, hiIncl) = (round % 4) match {
          case 0 => (false, true)
          case 1 => (true, false)
          case 2 => (true, true)
          case _ => (false, false)
        }
        val lower = if (loIncl) col("t") >= col("lo") else col("t") > col("lo")
        val upper = if (hiIncl) col("t") <= col("lo") + lit(w)
          else col("t") < col("lo") + lit(w)
        val c = col("k") === col("rk") && lower && upper
        val auto = l.join(r, c)
        assert(auto.queryExecution.executedPlan.toString.contains("RangeJoin"))
        val base = l.join(broadcast(r), c) // hint disables detection
        val a = auto.select($"lid", $"rid").as[(Long, Long)].collect().toSet
        val b = base.select($"lid", $"rid").as[(Long, Long)].collect().toSet
        assert(a == b,
          s"round $round (w=$w lo=$loIncl hi=$hiIncl): ${a.diff(b)} vs ${b.diff(a)}")
      }
    }
  }

  test("the left-outer spelling maps onto the exec directly") {
    noBroadcast {
      val (left, right) = sides
      val c = cond(loIncl = false, hiIncl = true)
      val outer = left.join(right, c, "left_outer")
      val plan = outer.queryExecution.executedPlan.toString
      assert(plan.contains("RangeJoin"),
        s"expected the left-outer spelling to go native in:\n$plan")
      val base = left.join(broadcast(right), c, "left_outer")
      assert(!base.queryExecution.executedPlan.toString.contains("RangeJoin"))
      assert(outer.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
        base.collect().map(_.toSeq.toVector: Seq[Any]).toSet)
      // left-outer in the [lo, hi) convention
      val c2 = cond(loIncl = true, hiIncl = false)
      val outer2 = left.join(right, c2, "left_outer")
      assert(outer2.queryExecution.executedPlan.toString.contains("RangeJoin"))
      val base2 = left.join(broadcast(right), c2, "left_outer")
      assert(outer2.collect().map(_.toSeq.toVector: Seq[Any]).toSet ==
        base2.collect().map(_.toSeq.toVector: Seq[Any]).toSet)
    }
  }

  test("SQL-text interval joins reach the native exec (q136, q141)") {
    noBroadcast {
      for (name <- Seq("q136_sql_interval_native", "q141_sql_interval_closed_open")) {
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("RangeJoin"),
          s"expected the SQL front door to auto-detect for $name in:\n$plan")
      }
    }
  }

  test("the spelled q37 shape (inner variant) goes native end to end") {
    noBroadcast {
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
}
