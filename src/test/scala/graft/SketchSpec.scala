package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sketch estimates are engine-specific, so q67 ships exact answers
  * plus boolean error-bound columns the DuckDB oracle checks as
  * literal TRUE; this spec asserts the same bounds hold and that the
  * exact side is sane.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("HLL distinct count within 5% and approx median within 1% of exact") {
    val rows = SparkEntry.queries("q67_sketch_aggregates")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"HLL out of its 5% bound for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Boolean]("tdigest_ok"),
        s"approx median out of its 1% bound for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Long]("exact_orders") > 0)
      assert(r.getAs[Double]("exact_median") > 0)
    }
  }

  test("histogram-rollup quantiles are within one bin width of exact") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q195_histogram_quantile_rollup")(spark, dir)
      .filter($"shard" === "__ALL__").collect().head
    val vals = graft.Tables.t(spark, dir, "events")
      .select($"value").orderBy($"value").collect().map(_.getDouble(0))
    def exact(p: Int): Double =
      vals(math.ceil(vals.length * p / 100.0).toInt - 1)
    for (p <- Seq(50, 90, 99)) {
      val a = approx.getAs[Long](s"p$p").toDouble
      val e = exact(p)
      // approx is the upper edge of exact's bin: 0 < a - e <= 8
      assert(a - e > 0 && a - e <= 8.0,
        s"p$p approx $a vs exact $e — outside one bin width")
    }
  }
}
