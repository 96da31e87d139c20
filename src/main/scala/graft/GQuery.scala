package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the corpus plus
  * (when SQL-expressible) an equivalent DuckDB oracle statement.
  *
  * Contract (driver): `fn(spark, sfDir)` and `oracle` must produce the
  * same rows with the SAME column names — the driver sorts columns by
  * name and hashes values, order-insensitively.
  *
  * `headline` marks the queries timed by [[Bench]].
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
