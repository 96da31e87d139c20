package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates have no cross-engine oracle (estimates are
  * engine-specific), so this spec bounds their error against the
  * exact answers computed in the same query.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("HLL distinct count within 5% and approx median within 1% of exact") {
    val rows = SparkEntry.queries("q67_sketch_aggregates")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxN = r.getAs[Long]("approx_orders").toDouble
      val exactN = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approxN - exactN) / exactN < 0.05,
        s"HLL off by ${math.abs(approxN - exactN) / exactN}")
      val approxM = r.getAs[Double]("approx_median")
      val exactM = r.getAs[Double]("exact_median")
      assert(math.abs(approxM - exactM) / exactM < 0.01,
        s"median off by ${math.abs(approxM - exactM) / exactM}")
    }
  }
}
