package graft

import graft.scale.{BoundedWindow, ExactRank}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactRank differential: the banded all-partitioned decomposition
  * must reproduce Spark's own single-partition row_number / ntile
  * bit-for-bit — including heavy exact-value ties (the case the hash
  * sub-banding exists for), descending orders via negation, and
  * row counts that don't divide the bucket count.
  */
class ExactRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private def data = {
    import spark.implicits._
    // 997 rows: a third of them tied on value=7 (one hot tie group),
    // the rest spread over a skewed long domain with duplicates.
    (1 to 997).map { i =>
      val v = if (i % 3 == 0) 7L else (i.toLong * i) % 61
      (i.toLong, v)
    }.toDF("id", "v")
  }

  test("banded row_number equals the single-partition reference, ties and all") {
    import spark.implicits._
    val withH = data.withColumn("h", ExactRank.h32($"id", ":t"))
    val got = ExactRank.rowNumber(withH, $"v", $"h", $"id", "rk", bands = 16)
    val want = withH.withColumn("rk2",
      row_number().over(BoundedWindow.ordered($"v", $"h", $"id")).cast("long"))
    val joined = got.join(want.select($"id", $"rk2"), "id")
    assert(joined.filter($"rk" =!= $"rk2").count() == 0)
    // ranks are a permutation of 1..n
    assert(got.agg(countDistinct($"rk")).head.getLong(0) == 997L)
    assert(got.agg(min($"rk"), max($"rk")).head() ==
      org.apache.spark.sql.Row(1L, 997L))
  }

  test("descending order via negation matches the DESC reference") {
    import spark.implicits._
    val withH = data.withColumn("h", ExactRank.h32($"id", ":d"))
    val got = ExactRank.rowNumber(withH, -$"v", $"h", $"id", "rk", bands = 8)
    val want = withH.withColumn("rk2",
      row_number().over(BoundedWindow.ordered($"v".desc, $"h", $"id")).cast("long"))
    assert(got.join(want.select($"id", $"rk2"), "id")
      .filter($"rk" =!= $"rk2").count() == 0)
  }

  test("ntileFromRank matches Spark's ntile for every bucket count 1..7") {
    import spark.implicits._
    val withH = data.withColumn("h", ExactRank.h32($"id", ":n"))
    val tot = withH.agg(count(lit(1)).as("total"))
    val ranked = ExactRank.rowNumber(
      withH.crossJoin(tot), $"v", $"h", $"id", "rk", bands = 32)
    (1 to 7).foreach { n =>
      val got = ranked.withColumn("b",
        ExactRank.ntileFromRank($"rk", $"total", n))
      val want = withH.withColumn("b2",
        ntile(n).over(BoundedWindow.ordered($"v", $"h", $"id")).cast("long"))
      assert(got.join(want.select($"id", $"b2"), "id")
        .filter($"b" =!= $"b2").count() == 0, s"ntile($n) mismatch")
    }
  }

  test("ntileFromRank when buckets exceed rows: each row its own bucket") {
    import spark.implicits._
    val small = (1 to 3).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .withColumn("h", ExactRank.h32($"id", ":s"))
    val ranked = ExactRank.rowNumber(
      small.crossJoin(small.agg(count(lit(1)).as("total"))),
      $"v", $"h", $"id", "rk", bands = 4)
    val got = ranked
      .withColumn("b", ExactRank.ntileFromRank($"rk", $"total", 10))
      .select($"rk", $"b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("empty input yields empty output, not a planning error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
      .withColumn("h", ExactRank.h32($"id", ":e"))
    assert(ExactRank.rowNumber(empty, $"v", $"h", $"id", "rk").count() == 0)
  }

  test("property: banded rank matches the reference on generated tie-heavy data") {
    import spark.implicits._
    import org.scalacheck.{Gen, rng}
    // a handful of seeded shapes: tiny domains (all ties), wide
    // domains (no ties), negative values, single row
    val gen = for {
      n <- Gen.choose(1, 400)
      domain <- Gen.oneOf(1L, 2L, 5L, 1000000L)
      shift <- Gen.oneOf(-500L, 0L, 7L)
    } yield (n, domain, shift)
    val seed0 = rng.Seed(20260814L)
    val cases = Iterator.iterate(seed0)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s))
      .collect { case Some(c) => c }.take(8).toSeq
    cases.foreach { case (n, domain, shift) =>
      val df = (1 to n).map { i =>
        (i.toLong, (i.toLong * 2654435761L % domain) + shift)
      }.toDF("id", "v").withColumn("h", ExactRank.h32($"id", ":pr"))
      val got = ExactRank.rowNumber(df, $"v", $"h", $"id", "rk", bands = 8)
      val want = df.withColumn("rk2", row_number().over(
        BoundedWindow.ordered($"v", $"h", $"id")).cast("long"))
      val bad = got.join(want.select($"id", $"rk2"), "id")
        .filter($"rk" =!= $"rk2").count()
      assert(bad == 0, s"case n=$n domain=$domain shift=$shift")
    }
  }

  test("no partition-less window in the ExactRank plan itself") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val withH = data.withColumn("h", ExactRank.h32($"id", ":p"))
    val plan = ExactRank.rowNumber(withH, $"v", $"h", $"id", "rk")
      .queryExecution.optimizedPlan
    val bad = plan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }
}
