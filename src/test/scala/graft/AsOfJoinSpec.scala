package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The native as-of join operator versus the composable spelling
  * (range join + per-key top-1 window): same rows on random data, and
  * the plan shape an as-of join should have (one merge operator, no
  * Window, no candidate-pair join).
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  /** Reference spelling: left-outer candidate join + top-1 window. */
  private def viaWindow(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"lid")
      .orderBy($"ron".desc_nulls_last, $"tie".desc_nulls_last)
    left.join(right, $"lby" === $"rby" && $"ron" <= $"lon", "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")
  }

  private def viaNative(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asof(left, right, "lon", "ron", "lby", "rby", "tie")
      .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")

  test("native as-of join equals the window spelling on 15 random datasets") {
    val rnd = new Random(20260812L)
    for (round <- 0 until 15) {
      val nKeys = 1 + rnd.nextInt(4)
      val lefts = Seq.tabulate(3 + rnd.nextInt(20))(i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(40).toLong))
      // ~1 in 5 right rows carries a null `on` timestamp: they sort at
      // the head of their group and must be skipped, never matched
      val rights = Seq.tabulate(rnd.nextInt(25))(i =>
        (i.toLong + 1000, s"k${rnd.nextInt(nKeys)}",
          if (rnd.nextInt(5) == 0) Option.empty[Long]
          else Some(rnd.nextInt(40).toLong),
          rnd.nextInt(5).toLong))
      val l = lefts.toDF("lid", "lby", "lon")
      val r = rights.toDF("rid", "rby", "ron", "tie")
      val got = viaNative(l, r).collect().map(_.toSeq.map(String.valueOf)).toSeq
      val want = viaWindow(l, r).collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"round $round: lefts=$lefts rights=$rights\n" +
          s"got=${got.sortBy(_.toString)}\nwant=${want.sortBy(_.toString)}")
    }
  }

  /** Forward reference spelling: earliest right at-or-after, smallest
    * tie first, optional tolerance on (ron - lon).
    */
  private def viaWindowFwd(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, tol: Option[Long]) = {
    val w = Window.partitionBy($"lid")
      .orderBy($"ron".asc_nulls_last, $"tie".asc_nulls_last)
    val base = $"lby" === $"rby" && $"ron" >= $"lon"
    val cond = tol.map(t => base && $"ron" - $"lon" <= t).getOrElse(base)
    left.join(right, cond, "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")
  }

  test("forward as-of (with and without tolerance) equals the window spelling") {
    val rnd = new Random(20260813L)
    for (round <- 0 until 15) {
      val nKeys = 1 + rnd.nextInt(4)
      val tol = if (round % 3 == 0) None else Some(rnd.nextInt(12).toLong)
      val lefts = Seq.tabulate(3 + rnd.nextInt(20))(i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(40).toLong))
      // unique ties: with duplicate (ron, tie) pairs the window
      // spelling's row_number picks arbitrarily among full ties and
      // the differential would compare two valid answers
      val rights = Seq.tabulate(rnd.nextInt(25))(i =>
        (i.toLong + 1000, s"k${rnd.nextInt(nKeys)}",
          if (rnd.nextInt(5) == 0) Option.empty[Long]
          else Some(rnd.nextInt(40).toLong),
          i.toLong))
      val l = lefts.toDF("lid", "lby", "lon")
      val r = rights.toDF("rid", "rby", "ron", "tie")
      val got = AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
          direction = "forward", tolerance = tol)
        .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      val want = viaWindowFwd(l, r, tol)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"round $round tol=$tol: lefts=$lefts rights=$rights\n" +
          s"got=${got.sortBy(_.toString)}\nwant=${want.sortBy(_.toString)}")
    }
  }

  /** Nearest reference spelling: rank all same-key rows by |ron-lon|,
    * preferring strictly-backward (ron < lon) on equal nonzero
    * distance, then the direction's own tie rule (backward: largest
    * tie; forward/equal-on: smallest — equal-on rows are the forward
    * cursor's), with unique ties making the answer total.
    */
  private def viaWindowNearest(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, tol: Option[Long]) = {
    val dist = abs($"ron" - $"lon")
    val isStrictBwd = ($"ron" < $"lon").cast("int")
    val w = Window.partitionBy($"lid").orderBy(
      dist.asc_nulls_last, isStrictBwd.desc_nulls_last,
      when($"ron" < $"lon", -$"tie").otherwise($"tie").asc_nulls_last)
    val base = $"lby" === $"rby" && $"ron".isNotNull
    val cond = tol.map(t => base && dist <= t).getOrElse(base)
    left.join(right, cond, "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")
  }

  test("nearest as-of (with and without tolerance) equals the window spelling") {
    val rnd = new Random(20260814L)
    for (round <- 0 until 15) {
      val nKeys = 1 + rnd.nextInt(4)
      val tol = if (round % 3 == 0) None else Some(rnd.nextInt(12).toLong)
      val lefts = Seq.tabulate(3 + rnd.nextInt(20))(i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(40).toLong))
      val rights = Seq.tabulate(rnd.nextInt(25))(i =>
        (i.toLong + 1000, s"k${rnd.nextInt(nKeys)}",
          if (rnd.nextInt(5) == 0) Option.empty[Long]
          else Some(rnd.nextInt(40).toLong),
          i.toLong))
      val l = lefts.toDF("lid", "lby", "lon")
      val r = rights.toDF("rid", "rby", "ron", "tie")
      val got = AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
          direction = "nearest", tolerance = tol)
        .select($"lid", $"lby", $"lon", $"rid", $"ron", $"tie")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      val want = viaWindowNearest(l, r, tol)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"round $round tol=$tol: lefts=$lefts rights=$rights\n" +
          s"got=${got.sortBy(_.toString)}\nwant=${want.sortBy(_.toString)}")
    }
  }

  test("backward tolerance nulls matches farther than the bound") {
    val l = Seq((1L, "a", 10L), (2L, "a", 30L)).toDF("lid", "lby", "lon")
    val r = Seq((100L, "a", Some(8L), 0L)).toDF("rid", "rby", "ron", "tie")
    val out = AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
        tolerance = Some(5L))
      .select($"lid", $"rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toSet
    // lon=10 is 2 units past ron=8 (within 5); lon=30 is 22 past (nulled)
    assert(out == Set((1L, 100L), (2L, -1L)))
  }

  test("as-of self-join (same source both sides) resolves and matches") {
    val ev = Seq(
      (1L, "u1", 10L, "click"), (2L, "u1", 20L, "purchase"),
      (3L, "u1", 15L, "click"), (4L, "u2", 5L, "purchase"),
      (5L, "u2", 9L, "click")
    ).toDF("event_id", "user_id", "ts", "kind")
    val purchases = ev.filter($"kind" === "purchase")
      .select($"event_id".as("pid"), $"user_id".as("pu"), $"ts".as("pts"))
    val clicks = ev.filter($"kind" === "click")
      .select($"event_id".as("cid"), $"user_id".as("cu"), $"ts".as("cts"))
    val out = AsOfJoin.asof(purchases, clicks, "pts", "cts", "pu", "cu", "cid")
      .select($"pid", $"cid").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // purchase 2 (u1, ts 20) ← click 3 (ts 15, the latest ≤ 20);
    // purchase 4 (u2, ts 5) has no click at or before it
    assert(out == Set((2L, 3L), (4L, -1L)))
  }

  test("null-`on` right rows at the group head do not block later matches") {
    // ascending nulls-first puts the null-ron row FIRST in group "a";
    // the cursor must consume it and still find ron=5 for lon=10
    val l = Seq((1L, "a", 10L), (2L, "a", 3L), (3L, "b", 7L))
      .toDF("lid", "lby", "lon")
    val r = Seq(
      (100L, "a", Option.empty[Long], 0L),
      (101L, "a", Some(5L), 1L),
      (102L, "b", Option.empty[Long], 2L)
    ).toDF("rid", "rby", "ron", "tie")
    val out = viaNative(l, r).collect().map(row =>
      (row.getLong(0), if (row.isNullAt(3)) -1L else row.getLong(3))).toSet
    // lid 1 (a,10) → rid 101 (ron 5); lid 2 (a,3) predates every valid
    // right row; lid 3 (b,7) sees only a null-ron row — both unmatched
    assert(out == Set((1L, 101L), (2L, -1L), (3L, -1L)))
  }

  test("tolerance and nearest reject on-types without a fixed-unit difference") {
    val l = Seq((1L, "a", "x")).toDF("lid", "lby", "lon")
    val r = Seq((9L, "a", "y", 0L)).toDF("rid", "rby", "ron", "tie")
    // string `on` supports ordering (backward works) but has no long
    // difference — tolerance and nearest must fail loudly at plan time
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
        tolerance = Some(5L))
    }
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
        direction = "nearest")
    }
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "lon", "ron", "lby", "rby", "tie",
        direction = "sideways")
    }
  }

  test("generated merge fuses into WholeStageCodegen and matches the " +
      "interpreted path, all directions (no fallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // s2 runs the generated path and turns fallback OFF so a broken
    // generated class throws instead of silently reverting; s3 forces
    // the interpreted doExecute path as the reference
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.codegen.wholeStage", "false")
    val rnd = new Random(20260815L)
    val lefts = Seq.tabulate(40)(i =>
      (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(40).toLong))
    val rights = Seq.tabulate(30)(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(3)}",
        if (rnd.nextInt(5) == 0) Option.empty[Long]
        else Some(rnd.nextInt(40).toLong),
        i.toLong))
    def frames(s: SparkSession) = {
      import s.implicits._
      (lefts.toDF("lid", "lby", "lon"), rights.toDF("rid", "rby", "ron", "tie"))
    }
    val (l2, r2) = frames(s2)
    val (l3, r3) = frames(s3)
    val cases = Seq(
      ("backward", None), ("backward", Some(6L)),
      ("forward", None), ("forward", Some(6L)),
      ("nearest", None), ("nearest", Some(6L)))
    for ((d, tol) <- cases) {
      val gen = AsOfJoin.asof(l2, r2, "lon", "ron", "lby", "rby", "tie",
        direction = d, tolerance = tol)
      val plan = gen.queryExecution.executedPlan
      assert(plan.exists {
        case w: WholeStageCodegenExec =>
          w.exists(_.isInstanceOf[graft.plans.AsOfJoinExec])
        case _ => false
      }, s"$d tol=$tol: AsOfJoin not inside WholeStageCodegen:\n$plan")
      val got = gen.select("lid", "rid", "ron")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
      val want = AsOfJoin.asof(l3, r3, "lon", "ron", "lby", "rby", "tie",
          direction = d, tolerance = tol)
        .select("lid", "rid", "ron")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
      assert(got == want, s"$d tol=$tol:\ngot=$got\nwant=$want")
    }
  }

  test("plan contains the merge exec and no Window or nested-loop join") {
    val l = Seq((1L, "a", 3L)).toDF("lid", "lby", "lon")
    val r = Seq((9L, "a", 2L, 0L)).toDF("rid", "rby", "ron", "tie")
    val plan = viaNative(l, r).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoin exec in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(!plan.contains("NestedLoop"), s"unexpected nested loop in:\n$plan")
  }
}
