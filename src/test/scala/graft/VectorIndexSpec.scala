package graft

import graft.scale.VectorIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the persisted IVF index: the probe reads ONLY the index
  * (never raw embeddings), the assignments scan partition-prunes to
  * the probed cells, and the probe-cell bound fails loudly.
  */
class VectorIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private def tmpIdx(): String = {
    val d = java.nio.file.Files.createTempDirectory("vecidx").toFile
    d.deleteOnExit()
    new java.io.File(d, "idx").getAbsolutePath
  }

  /** 40 vectors in 4 well-separated cells (dim 4). */
  private def corpus(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 40).map { i =>
      val cell = i % 4
      val base = Array.fill(4)(0.05f * (i % 7))
      base(cell) = 1.0f + 0.01f * i
      (i.toLong, base.toSeq, cell)
    }.toDF("vec_id", "embedding", "label")
  }

  test("probe scans only the index, partition-pruned to the probed cells") {
    val path = tmpIdx()
    VectorIndex.write(corpus(), path)
    import spark.implicits._
    // a query vector pointing at cell 1 (in-memory — any file scan in
    // the probe plan can only be the index)
    val q = Seq((900L, Seq(0L, 10100L, 0L, 0L), 10100L * 10100L))
      .toDF("qid", "qv", "qn")
    val out = VectorIndex.probe(spark, path, q, nprobe = 2, k = 3)
    val scans = out.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        (f.relation.location.rootPaths.map(_.toString),
          f.partitionFilters.map(_.sql))
    }
    assert(scans.nonEmpty, "probe must read the persisted index")
    scans.foreach { case (roots, _) =>
      roots.foreach(p => assert(p.contains(new java.io.File(path).getName),
        s"probe scanned a non-index file: $p"))
    }
    // the assignments scan carries a partition filter on the cell
    // label — the probed-cells pruning that makes IVF sublinear
    val assignScan = scans.find(_._1.exists(_.contains("assignments")))
    assert(assignScan.isDefined, "expected an assignments scan")
    assert(assignScan.get._2.exists(_.contains("label")),
      s"assignments scan must partition-prune on label; " +
        s"filters=${assignScan.get._2}")
    // and the results are the cell-1 neighbors
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("cid") % 4 == 1),
      "top-3 must come from the probed (nearest) cell")
  }

  test("probe-cell bound fails loudly instead of un-pruning the scan") {
    val path = tmpIdx()
    import spark.implicits._
    // more cells than MaxProbeCells, one vector each
    val wide = (0 until (VectorIndex.MaxProbeCells + 8)).map { i =>
      (i.toLong, Seq.fill(4)(0.1f * (1 + i % 3)), i)
    }.toDF("vec_id", "embedding", "label")
    VectorIndex.write(wide, path)
    val qs = (0 until (VectorIndex.MaxProbeCells + 8)).map(i =>
      (10000L + i, Seq(10000L, 0L, 0L, 0L), 10000L * 10000L))
      .toDF("qid", "qv", "qn")
    val e = intercept[IllegalArgumentException](
      VectorIndex.probe(spark, path, qs,
        nprobe = VectorIndex.MaxProbeCells + 8, k = 1).collect())
    assert(e.getMessage.contains("cells"))
  }
}
