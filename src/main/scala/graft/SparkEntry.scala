package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is registered as a [[GQuery]] in one of the
  * per-area modules below; this object only aggregates them into the
  * maps the driver consumes.
  */
object SparkEntry {

  /** Full capability registry, one GQuery per operator from SURVEY.md §2
    * plus the LLM-pipeline extensions.
    */
  def registry: Seq[GQuery] =
    RelationalQueries.all ++
      SetOpQueries.all ++
      ScalarQueries.all ++
      WindowQueries.all ++
      BgpQueries.all ++
      EventQueries.all ++
      TextQueries.all ++
      DedupQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all ++
      GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
