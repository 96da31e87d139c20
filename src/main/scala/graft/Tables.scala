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

  /** Load one corpus table from an sf directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

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
