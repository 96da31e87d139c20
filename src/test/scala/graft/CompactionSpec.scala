package graft

import graft.scale.Compaction
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction specs: the first-fit plan against a hand-computed
  * fixture, and the end-to-end invariants — fewer files out than in,
  * zero rows changed.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("planBins first-fit packs in name order") {
    val files = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
    assert(Compaction.planBins(files, 25L) ==
      Map("a" -> 0, "b" -> 0, "c" -> 1, "d" -> 1))
    // an oversized file still lands alone in its own bin
    assert(Compaction.planBins(Seq(("x", 100L), ("y", 1L)), 25L) ==
      Map("x" -> 0, "y" -> 1))
    // everything fits under a large target
    assert(Compaction.planBins(files, 1000L).values.toSet == Set(0))
  }

  test("compaction shrinks the file count and changes no rows") {
    import spark.implicits._
    val in = "target/tmp/compaction_spec_in"
    val out = "target/tmp/compaction_spec_out"
    spark.range(10000).select($"id", ($"id" % 7).as("k"))
      .repartition(32).write.mode("overwrite").parquet(in)
    Compaction.compact(spark, in, out, targetBytes = 512L * 1024)
    def nFiles(p: String) = spark.read.parquet(p)
      .select(input_file_name()).distinct().count()
    assert(nFiles(in) == 32)
    assert(nFiles(out) < 32, s"expected fewer than 32 files, got ${nFiles(out)}")
    val a = spark.read.parquet(in).agg(count(lit(1)), sum($"id"), sum($"k"))
      .collect().head.toSeq
    val b = spark.read.parquet(out).agg(count(lit(1)), sum($"id"), sum($"k"))
      .collect().head.toSeq
    assert(a == b, "compaction changed the data")
  }

  test("partitioned tables compact per partition, layout preserved") {
    import spark.implicits._
    val in = "target/tmp/compaction_spec_part_in"
    val out = "target/tmp/compaction_spec_part_out"
    spark.range(9000)
      .select($"id", ($"id" % 3).as("day"), ($"id" % 11).as("v"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("day").parquet(in)
    Compaction.compact(spark, in, out, targetBytes = 1L << 20)
    // layout preserved: the same day=N directories, discoverable as a
    // partition column on read
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outDirs = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(outDirs == Set("day=0", "day=1", "day=2"), s"layout: $outDirs")
    // fewer files per partition (8 fragments -> packed)
    def nFiles(p: String) = spark.read.parquet(p)
      .select(input_file_name()).distinct().count()
    assert(nFiles(in) == 24, s"fixture should start at 24 files, got ${nFiles(in)}")
    assert(nFiles(out) < 24, s"expected fewer files, got ${nFiles(out)}")
    // zero row change, per partition
    def agg(p: String) = spark.read.parquet(p)
      .groupBy($"day").agg(count(lit(1)), sum($"id"), sum($"v"))
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.toString)
    assert(agg(in) == agg(out), "partitioned compaction changed the data")
    // partition pruning still works on the compacted tree
    val pruned = spark.read.parquet(out).filter($"day" === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"expected partition pruning in:\n$scan")
    assert(pruned.count() == 3000)
  }
}
