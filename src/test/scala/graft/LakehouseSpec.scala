package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the lakehouse-maintenance trio (q201
  * snapshot diff, q202 CDC merge, q203 SCD2 history) that a
  * value-level oracle match can't distinguish from coincidence:
  * full accounting (every key classified exactly once), latest-wins
  * precedence (a later update beats an earlier delete), and the
  * SCD2 structural law of exactly one open interval per key.
  */
class LakehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val keys: Seq[Long] = {
    import spark.implicits._
    Tables.t(spark, sf, "orders").select($"o_orderkey".cast("long"))
      .as[Long].collect().toSeq
  }

  test("q201 accounts for every key of v1 UNION v2 exactly once") {
    import spark.implicits._
    val df = run("q201_snapshot_diff")
    val total = df.agg(sum($"n")).first().getLong(0)
    val expected = keys.count(k => k % 97 != 0 || k % 89 != 0)
    assert(total == expected, "sum of class counts must equal |v1 UNION v2|")
    val byType = df.select($"change_type", $"n").as[(String, Long)]
      .collect().toMap
    assert(byType("added") == keys.count(k => k % 97 == 0 && k % 89 != 0))
    assert(byType("removed") == keys.count(k => k % 89 == 0 && k % 97 != 0))
  }

  test("q202 latest-wins precedence: an update after a delete revives the key") {
    import spark.implicits._
    val byOutcome = run("q202_cdc_merge")
      .select($"outcome", $"n").as[(String, Long)].collect().toMap
    // deleted = divisible by 7 (seq-20 D) UNLESS divisible by 11
    // (seq-30 U wins); updated = divisible by 5 or 11, minus the
    // still-deleted set; inserted = the k+10M rows for 13 | k
    assert(byOutcome("deleted") == keys.count(k => k % 7 == 0 && k % 11 != 0))
    assert(byOutcome("updated") ==
      keys.count(k => (k % 5 == 0 || k % 11 == 0) && !(k % 7 == 0 && k % 11 != 0)))
    assert(byOutcome("inserted") == keys.count(_ % 13 == 0))
    assert(byOutcome.values.sum == keys.size + keys.count(_ % 13 == 0),
      "every base key and every insert classified exactly once")
  }

  test("q203 has exactly one open interval per key and changes sized by real edits") {
    import spark.implicits._
    val df = run("q203_scd2_history")
    val open = df.filter($"valid_to".isNull).agg(sum($"n")).first().getLong(0)
    assert(open == keys.size, "exactly one current row per key")
    val total = df.agg(sum($"n")).first().getLong(0)
    val expected = keys.size + keys.count(_ % 13 == 0) + keys.count(_ % 17 == 0)
    assert(total == expected, "history rows = keys + one per real change")
  }
}
