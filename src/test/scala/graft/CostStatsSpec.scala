package graft

import graft.tools.CostStats
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CostStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("measure records rows+runtime, empty results cache as -1 (ref entry point C)") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempDirectory("stats").resolve("s.txt").toString
    val stats = new CostStats(f)

    val (n1, secs1) = stats.measure("<1>.3.4.5", Seq(1, 2, 3).toDF("x"))
    assert(n1 == 3 && secs1 > 0)
    val (n2, _) = stats.measure("<1>.1.6", Seq.empty[Int].toDF("x"))
    assert(n2 == 0)

    val loaded = stats.load()
    assert(loaded("<1>.3.4.5")._1 == 3L)
    assert(loaded("<1>.1.6")._1 == -1L)
    assert(stats.knownEmpty("<1>.1.6"))
    assert(!stats.knownEmpty("<1>.3.4.5"))

    // re-measurement appends; last write wins on load
    stats.measure("<1>.3.4.5", Seq(1).toDF("x"))
    assert(stats.load()("<1>.3.4.5")._1 == 1L)
  }

  test("catalog ANALYZE gives CBO real rowCounts (join reorder inputs)") {
    import graft.tools.CatalogStats
    val names = CatalogStats.registerAndAnalyze(
      spark, "/root/testdata/sf0.001", Seq("nation", "region", "customer"))
    // stats land in the catalog and flow into the optimized plan
    for (name <- names) {
      val rel = spark.table(name)
      val rc = rel.queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined && rc.get.toLong == rel.count(),
        s"$name should carry an exact analyzed rowCount, got $rc")
    }
    // with CBO stats present, the planner broadcasts the small side of
    // a stats-visible join without AQE's help (initial plan, not final)
    val joined = spark.sql(
      s"""SELECT c_name, n_name FROM ${names(2)} c
         |JOIN ${names(0)} n ON c.c_nationkey = n.n_nationkey""".stripMargin)
    val initial = joined.queryExecution.sparkPlan.toString
    assert(initial.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast join, got:\n$initial")
  }
}
