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

  test("every query plans against sf0.001 with no partition-less window " +
    "(analysis errors and single-task global sorts surface here, not in the driver)") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Window => LWindow, WindowGroupLimit}
    SparkEntry.queries.foreach { case (name, fn) =>
      // planning errors get the query's name attached…
      val qe =
        try fn(spark, "/root/testdata/sf0.001").queryExecution
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      // …and so does the r6-verdict scale gate: a window with an empty
      // partition spec is Spark's move-everything-to-one-task plan
      // (the `WindowExec: No Partition Defined` warning). Bounded
      // relations must route through BoundedWindow.ordered (whose
      // constant partition key survives optimization), data-grain
      // ranking through ExactRank — so NO registry query may reach
      // the optimizer with an empty-spec window.
      val bad = qe.optimizedPlan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty =>
          s"Window(${w.windowExpressions.map(_.name).mkString(",")})"
        case w: WindowGroupLimit if w.partitionSpec.isEmpty =>
          "WindowGroupLimit"
      }
      assert(bad.isEmpty, s"$name plans partition-less window(s) " +
        s"${bad.mkString("; ")} — use BoundedWindow.ordered (bounded " +
        "relation) or ExactRank (data-grain ranking)")
    }
  }
}
