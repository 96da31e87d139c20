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
}
