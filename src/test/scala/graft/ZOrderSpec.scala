package graft

import graft.scale.ZOrder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout specs: Morton-value correctness against hand-computed
  * interleavings, and the pruning precondition — after clustering, each
  * written file covers a narrow square of BOTH dimensions, so a 2-D box
  * overlaps only a fraction of the files (a plain single-column sort
  * leaves the second dimension unpruned: every file spans it fully).
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("zvalue matches hand-computed Morton codes") {
    import spark.implicits._
    // (a, b, morton): a in even bits, b in odd. morton(3,5):
    // a=011 -> bits 0,2 set (1+4); b=101 -> bits 1,5 set (2+32) = 39.
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (1L, 1L, 3L), (3L, 5L, 39L), (7L, 7L, 63L), (255L, 0L, 21845L))
    val got = cases.toDF("a", "b", "want")
      .withColumn("z", ZOrder.zvalue(col("a"), col("b"), 8))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") == r.getAs[Long]("want"),
        s"morton(${r.getAs[Long]("a")}, ${r.getAs[Long]("b")})")
    }
  }

  test("z-clustered files are narrow in both dimensions and a box prunes") {
    import spark.implicits._
    // 64x64 uniform grid, 16 files: perfect clustering gives each file
    // a 16x16 square; assert files stay within 2x of that in BOTH dims
    // and that a 16x16 box overlaps at most half the files.
    val dim = 64
    val grid = spark.range(dim.toLong * dim).select(
      ($"id" % dim).as("a"), ($"id" / dim).cast("long").as("b"))
    val out = "target/tmp/zorder_spec"
    ZOrder.writeZClustered(grid, "a", "b", 6, out, 16)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("amin"), max("a").as("amax"),
        min("b").as("bmin"), max("b").as("bmax"))
      .collect()
    assert(perFile.length > 4, s"expected multiple files, got ${perFile.length}")
    perFile.foreach { r =>
      val aw = r.getAs[Long]("amax") - r.getAs[Long]("amin")
      val bw = r.getAs[Long]("bmax") - r.getAs[Long]("bmin")
      assert(aw <= 32 && bw <= 32,
        s"file spans a=$aw b=$bw — not clustered in both dims")
    }
    val (lo, hi) = (16L, 31L)
    val overlapping = perFile.count { r =>
      r.getAs[Long]("amin") <= hi && r.getAs[Long]("amax") >= lo &&
        r.getAs[Long]("bmin") <= hi && r.getAs[Long]("bmax") >= lo
    }
    assert(overlapping * 2 <= perFile.length,
      s"box overlaps $overlapping of ${perFile.length} files — no pruning headroom")
  }
}
