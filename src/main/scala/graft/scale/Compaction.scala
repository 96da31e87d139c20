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

  /** Compact `inPath` (parquet) into `outPath` with ~targetBytes files. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Unit = {
    val hadoopPath = new Path(inPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hadoopPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
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
