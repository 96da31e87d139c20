package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the things the harness assumes and a
  * silent regression would break without any query failing.
  */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("registry names are unique (duplicates would silently shadow in the map)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(names.distinct.size == names.size, s"duplicate names: ${dups.mkString(", ")}")
  }

  test("every oracle belongs to a registered query and at least one query is headline") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.registry.exists(_.headline))
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query plans against sf0.001 (analysis errors surface here, not in the driver)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, "/root/testdata/sf0.001").schema
      catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
    }
  }
}
