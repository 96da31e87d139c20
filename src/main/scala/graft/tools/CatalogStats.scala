package graft.tools

import org.apache.spark.sql.SparkSession

/** Catalog registration + ANALYZE for the corpus tables — the piece
  * that makes `spark.sql.cbo.joinReorder` (enabled in GraftSession)
  * actually fire: Catalyst's cost-based join reorder reads rowCount /
  * column stats from the catalog, so path-read DataFrames never
  * benefit. Registering the parquet as external tables and running
  * ANALYZE is the catalog-backed analog of DREAM's persisted stats
  * files (SURVEY.md §2.1 S4 / §4.2): measure once, plan from
  * measurements on every later query.
  *
  * Intended use on a cluster: run once after load (like `ANALYZE` in
  * any warehouse), then write queries against `spark.table(...)` /
  * `spark.sql(...)`. The driver-contract queries keep reading by path
  * (the DuckDB oracle compares files, not catalogs), so this is a
  * capability surface, spec-verified in CostStatsSpec.
  */
object CatalogStats {

  val corpusTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  /** Register `dir`'s parquet tables under `graft_<tag>_<name>` and
    * compute full statistics. Returns the registered names.
    */
  def registerAndAnalyze(spark: SparkSession, dir: String,
      tables: Seq[String] = corpusTables,
      columnStats: Boolean = true): Seq[String] = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    tables.map { t =>
      val name = s"graft_${tag}_$t"
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS" +
        (if (columnStats) " FOR ALL COLUMNS" else ""))
      name
    }
  }
}
