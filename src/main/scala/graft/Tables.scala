package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver corpus (TESTDATA.md).
  *
  * All data access goes through here so every query benefits from the
  * same scan hygiene: plain `spark.read.parquet` keeps Catalyst free to
  * push filters and prune columns down to the parquet reader — at 100 TB
  * the scan is the dominant cost, and a declarative scan is the only one
  * the optimizer can shrink.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // r15: one `spark.read.parquet` per (session, dir, table) per JVM.
  // Every read re-infers the schema (a small footer job) and re-lists
  // the path — pure per-query fixed cost repeated hundreds of times
  // across a registry sweep. The corpus dirs are immutable inputs by
  // the driver contract, so the analyzed plan (a file-listing
  // snapshot) can be reused for the session's lifetime. Plain map, no
  // persist — this caches the PLAN, never data, so scans/pushdown are
  // untouched.
  private val tableMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame]()

  /** Load one corpus table from an sf directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    tableMemo.computeIfAbsent((spark, dir, name), { _ =>
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEvents(df) else df
    })

  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it arrives as a Long of
    * epoch-nanos. Convert to a µs timestamp with integer division (a
    * double division would lose precision at 1.7e18 ns). Public so
    * streaming readers of the same files can apply it too.
    */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      // a session without GraftSession's inferTimestampNTZ=false reads
      // naive parquet micros as NTZ; cast to TIMESTAMP (session tz is
      // UTC) so unix_micros/watermarks work and epochs match the oracle
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
