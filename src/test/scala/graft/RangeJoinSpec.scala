package graft

import graft.plans.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The native range join operator versus the composable spelling
  * (equi-join on the key + two non-equi time conjuncts): same rows on
  * random data — variable window widths included, which stress the
  * sliding buffer's "rows past hi stay alive for wider later windows"
  * path — and the plan shape an interval join should have (one merge
  * operator, no broadcast-nested-loop, no candidate-pair hash join).
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  /** Reference spelling: left-outer join with lo < on <= hi. */
  private def viaJoin(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    left.join(right,
        $"lby" === $"rby" && $"ron" > $"lo" && $"ron" <= $"hi", "left_outer")
      .select($"lid", $"lby", $"lo", $"hi", $"rid", $"ron")

  private def viaNative(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    RangeJoin.range(left, right, "lo", "hi", "lby", "rby", "ron")
      .select($"lid", $"lby", $"lo", $"hi", $"rid", $"ron")

  test("native range join equals the join spelling on 15 random datasets") {
    val rnd = new Random(20260812L)
    for (round <- 0 until 15) {
      val nKeys = 1 + rnd.nextInt(4)
      // variable widths (0..15) — some windows nest inside others; and
      // duplicate lo values within one key
      val lefts = Seq.tabulate(3 + rnd.nextInt(20)) { i =>
        val lo = rnd.nextInt(40).toLong
        (i.toLong, s"k${rnd.nextInt(nKeys)}", lo, lo + rnd.nextInt(16).toLong)
      }
      // ~1 in 5 right rows carries a null `on`: skipped, never matched
      val rights = Seq.tabulate(rnd.nextInt(30))(i =>
        (i.toLong + 1000, s"k${rnd.nextInt(nKeys)}",
          if (rnd.nextInt(5) == 0) Option.empty[Long]
          else Some(rnd.nextInt(40).toLong)))
      val l = lefts.toDF("lid", "lby", "lo", "hi")
      val r = rights.toDF("rid", "rby", "ron")
      val got = viaNative(l, r).collect().map(_.toSeq.map(String.valueOf)).toSeq
      val want = viaJoin(l, r).collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"round $round: lefts=$lefts rights=$rights\n" +
          s"got=${got.sortBy(_.toString).mkString("\n")}\n" +
          s"want=${want.sortBy(_.toString).mkString("\n")}")
    }
  }

  test("narrow window after a wide one still sees buffered rows past its hi") {
    // L1 (lo 0, hi 20) buffers ron 5 and 15; L2 (lo 1, hi 6) must match
    // ONLY ron 5 — ron 15 stays buffered, not emitted
    val l = Seq((1L, "a", 0L, 20L), (2L, "a", 1L, 6L)).toDF("lid", "lby", "lo", "hi")
    val r = Seq((100L, "a", 5L), (101L, "a", 15L)).toDF("rid", "rby", "ron")
    val got = viaNative(l, r).collect()
      .map(x => (x.getLong(0), x.getLong(4))).toSet
    assert(got == Set((1L, 100L), (1L, 101L), (2L, 100L)))
  }

  test("unmatched lefts and null keys emit exactly one null-extended row") {
    val l = Seq((1L, "a", 0L, 2L), (2L, "zzz", 0L, 99L)).toDF("lid", "lby", "lo", "hi")
    val r = Seq((100L, "a", 50L)).toDF("rid", "rby", "ron")
    val got = viaNative(l, r).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(4)) -1L else x.getLong(4))).toSeq
    assert(got.sorted == Seq((1L, -1L), (2L, -1L)))
  }

  test("plan contains the merge exec and no nested-loop or hash join") {
    val l = Seq((1L, "a", 0L, 9L)).toDF("lid", "lby", "lo", "hi")
    val r = Seq((9L, "a", 2L)).toDF("rid", "rby", "ron")
    val plan = viaNative(l, r).queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"expected RangeJoin exec in:\n$plan")
    assert(!plan.contains("NestedLoop"), s"unexpected nested loop in:\n$plan")
    assert(!plan.contains("HashJoin"), s"unexpected hash join in:\n$plan")
  }

  private def rangeExecs(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[graft.plans.RangeJoinExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case r: graft.plans.RangeJoinExec => Seq(r); case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case o => o.children
    }
    here ++ kids.flatMap(rangeExecs)
  }

  test("the sliding buffer reports its peak through a SQL metric") {
    // one wide window (0, 20] over 10 right rows: the buffer must grow
    // to 10 and the per-task peak lands in the metric
    val l = Seq((1L, "a", 0L, 20L)).toDF("lid", "lby", "lo", "hi")
    val r = Seq.tabulate(10)(i => (100L + i, "a", i.toLong + 1))
      .toDF("rid", "rby", "ron")
    val df = viaNative(l, r)
    // materialize THIS dataset (count() would plan a separate query
    // whose metrics live on a different exec instance)
    assert(df.collect().length == 10)
    val peaks = rangeExecs(df.queryExecution.executedPlan)
      .map(_.metrics("peakBufferRows").value)
    assert(peaks.nonEmpty && peaks.max >= 10L,
      s"expected a recorded buffer peak >= 10, got $peaks")
  }

  test("generated merge fuses into WholeStageCodegen and matches the " +
      "interpreted path (no fallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // s2 runs the generated path with fallback OFF (a broken generated
    // class throws); s3 forces the interpreted doExecute path
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.codegen.wholeStage", "false")
    val rnd = new Random(20260815L)
    val lefts = Seq.tabulate(40) { i =>
      val lo = rnd.nextInt(40).toLong
      (i.toLong, s"k${rnd.nextInt(3)}", lo, lo + rnd.nextInt(16).toLong)
    }
    val rights = Seq.tabulate(35)(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(3)}",
        if (rnd.nextInt(5) == 0) Option.empty[Long]
        else Some(rnd.nextInt(40).toLong)))
    def frames(s: SparkSession) = {
      import s.implicits._
      (lefts.toDF("lid", "lby", "lo", "hi"), rights.toDF("rid", "rby", "ron"))
    }
    val (l2, r2) = frames(s2)
    val (l3, r3) = frames(s3)
    val gen = RangeJoin.range(l2, r2, "lo", "hi", "lby", "rby", "ron")
    val plan = gen.queryExecution.executedPlan
    assert(plan.exists {
      case w: WholeStageCodegenExec =>
        w.exists(_.isInstanceOf[graft.plans.RangeJoinExec])
      case _ => false
    }, s"RangeJoin not inside WholeStageCodegen:\n$plan")
    val got = gen.select("lid", "rid", "ron")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
    val want = RangeJoin.range(l3, r3, "lo", "hi", "lby", "rby", "ron")
      .select("lid", "rid", "ron")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("merge loop fused under an aggregate parent still compiles " +
      "(no unreachable-statement fallback)") {
    // under HashAggregate-without-keys the produce loop lands inside
    // doAggregateWithoutKey(); an infinite while(true) there makes the
    // aggregate's trailing code unreachable and Janino rejects the
    // stage — fallback OFF turns that silent interpreted-mode
    // degradation into a test failure
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    import s2.implicits._
    val l = Seq((1L, "a", 0L, 10L), (2L, "a", 3L, 7L), (3L, "b", 1L, 4L))
      .toDF("lid", "lby", "lo", "hi")
    val r = Seq((100L, "a", 2L), (101L, "a", 5L), (102L, "b", 2L),
      (103L, "b", 9L)).toDF("rid", "rby", "ron")
    val n = RangeJoin.range(l, r, "lo", "hi", "lby", "rby", "ron")
      .where($"rid".isNotNull).select("lid", "rid").distinct().count()
    // [0,10]a ⊇ {2,5}; [3,7]a ⊇ {5}; [1,4]b ⊇ {2}
    assert(n == 4L, s"expected 4 distinct in-window pairs, got $n")
  }

  test("window >> gap past the in-memory cap spills and completes " +
      "with the metric showing it") {
    val key = graft.plans.RangeJoin.MaxBufferRowsKey
    spark.conf.set(key, "4")
    try {
      // every left window covers all 50 right rows — the buffer must
      // hold 50 rows, 12x the in-memory cap, so it migrates to the
      // spillable array and still produces every pair
      val l = Seq((1L, "a", 0L, 1000L), (2L, "a", 1L, 1000L))
        .toDF("lid", "lby", "lo", "hi")
      val r = Seq.tabulate(50)(i => (100L + i, "a", i.toLong + 2))
        .toDF("rid", "rby", "ron")
      val df = viaNative(l, r)
      val got = df.collect().map(x => (x.getLong(0), x.getLong(4))).toSet
      val want = viaJoin(l, r).collect()
        .map(x => (x.getLong(0), x.getLong(4))).toSet
      assert(got == want && got.size == 100, s"got ${got.size} pairs")
      val spills = rangeExecs(df.queryExecution.executedPlan)
        .map(_.metrics("bufferSpills").value)
      assert(spills.nonEmpty && spills.max >= 1L,
        s"expected a recorded buffer spill, got $spills")
    } finally spark.conf.unset(key)
  }

  test("spilled and in-memory merges agree row for row (both exec paths)") {
    // s2: generated path, spilling (cap 3), fallback off; s3:
    // interpreted path, spilling; both must equal the in-memory run
    val s2 = spark.newSession()
    s2.conf.set(graft.plans.RangeJoin.MaxBufferRowsKey, "3")
    s2.conf.set("spark.sql.codegen.fallback", "false")
    val s3 = spark.newSession()
    s3.conf.set(graft.plans.RangeJoin.MaxBufferRowsKey, "3")
    s3.conf.set("spark.sql.codegen.wholeStage", "false")
    val rnd = new Random(20260816L)
    val lefts = Seq.tabulate(30) { i =>
      val lo = rnd.nextInt(30).toLong
      (i.toLong, s"k${rnd.nextInt(2)}", lo, lo + 5 + rnd.nextInt(25).toLong)
    }
    val rights = Seq.tabulate(60)(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(2)}",
        if (rnd.nextInt(6) == 0) Option.empty[Long]
        else Some(rnd.nextInt(30).toLong)))
    def run(s: SparkSession) = {
      import s.implicits._
      val l = lefts.toDF("lid", "lby", "lo", "hi")
      val r = rights.toDF("rid", "rby", "ron")
      RangeJoin.range(l, r, "lo", "hi", "lby", "rby", "ron")
        .select("lid", "rid", "ron")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
    }
    val inMem = run(spark)
    assert(run(s2) == inMem, "generated spilled path diverged")
    assert(run(s3) == inMem, "interpreted spilled path diverged")
  }

  test("one group past the hard cap fails loudly, not by filling the disk") {
    val s2 = spark.newSession()
    s2.conf.set(graft.plans.RangeJoin.MaxBufferRowsKey, "4")
    s2.conf.set(graft.plans.RangeJoin.HardMaxBufferRowsKey, "16")
    import s2.implicits._
    val l = Seq((1L, "a", 0L, 1000L)).toDF("lid", "lby", "lo", "hi")
    val r = Seq.tabulate(50)(i => (100L + i, "a", i.toLong + 2))
      .toDF("rid", "rby", "ron")
    val e = intercept[Exception] {
      RangeJoin.range(l, r, "lo", "hi", "lby", "rby", "ron").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("hard cap")),
      s"expected the hard-cap error, got: $e")
  }
}
