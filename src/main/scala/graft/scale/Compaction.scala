package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction: bin-pack a fragmented parquet directory into
  * ~targetBytes outputs. Streaming sinks, per-shard writers, and
  * incremental batches all fragment a table over time; at 100 TB the
  * file-listing and task-scheduling overhead of millions of KB-sized
  * files dominates scan cost, so periodic compaction is table
  * maintenance, not an optimization. The plan is computed from the
  * FILE LISTING only (names + sizes — metadata-sized, never a data
  * scan): greedy first-fit binning in name order, then one shuffle
  * routes rows to their bin and each range partition writes one
  * output file. Rows never change — callers verify by re-aggregating
  * the compacted table (q197's oracle does exactly that).
  */
object Compaction {

  /** Greedy first-fit bin assignment over (file, size) in name order.
    * Exposed for the spec; driver-side but metadata-sized (one entry
    * per FILE, not per row).
    */
  def planBins(files: Seq[(String, Long)], targetBytes: Long): Map[String, Int] = {
    require(targetBytes > 0, "targetBytes must be positive")
    var bin = 0
    var acc = 0L
    val out = Map.newBuilder[String, Int]
    files.sortBy(_._1).foreach { case (f, sz) =>
      if (acc > 0 && acc + sz > targetBytes) { bin += 1; acc = 0L }
      out += f -> bin
      acc += sz
    }
    out.result()
  }

  /** Compact `inPath` (parquet) into `outPath` with ~targetBytes files.
    *
    * Hive-layout partitioned tables (`k=v` subdirectories, the layout
    * SCALE.md recommends for date-partitioned facts) are handled by
    * recursing to each leaf partition directory and bin-packing it IN
    * PLACE in the output tree — the partition layout is preserved
    * verbatim, so partition pruning on the compacted table works
    * unchanged. Discovery stays metadata-sized (a directory walk; one
    * entry per file); each partition compacts as its own distributed
    * job, so driver memory never holds more than one partition's file
    * listing and a failed partition can be re-run alone.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Unit = {
    val root = new Path(inPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // leaf directories holding parquet files, keyed by their relative
    // k=v/... path ("" = unpartitioned root)
    def walk(dir: Path, rel: String): Seq[(String, Seq[(String, Long)])] = {
      val entries = fs.listStatus(dir).toSeq
      val here = entries
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.getName, s.getLen))
      val subs = entries
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap { d =>
          val name = d.getPath.getName
          walk(d.getPath, if (rel.isEmpty) name else s"$rel/$name")
        }
      (if (here.nonEmpty) Seq(rel -> here) else Nil) ++ subs
    }
    val leaves = walk(root, "")
    require(leaves.nonEmpty, s"no parquet files under $inPath")
    leaves.foreach { case (rel, files) =>
      val in = if (rel.isEmpty) inPath else s"$inPath/$rel"
      val out = if (rel.isEmpty) outPath else s"$outPath/$rel"
      compactDir(spark, in, out, files, targetBytes)
    }
  }

  /** Compact ONE directory's files (no recursion) into `outPath`. */
  private def compactDir(spark: SparkSession, inPath: String,
      outPath: String, files: Seq[(String, Long)], targetBytes: Long): Unit = {
    val bins = planBins(files, targetBytes)
    val nBins = bins.values.max + 1
    // file→bin as a broadcast join on the basename (no UDF, and no
    // URI-scheme mismatch between the listing and input_file_name)
    import spark.implicits._
    val binsDf = bins.toSeq.toDF("__f", "__bin")
    spark.read.parquet(inPath)
      .withColumn("__f", element_at(split(input_file_name(), "/"), -1))
      .join(GuardedBroadcast.maybe(binsDf), Seq("__f"), "left")
      .drop("__f")
      .withColumn("__bin", coalesce(col("__bin"), lit(0)))
      .repartitionByRange(nBins, col("__bin"))
      .drop("__bin")
      .write.mode("overwrite").parquet(outPath)
  }
}
