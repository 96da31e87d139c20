package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Measured-cost statistics cache — the Spark analog of the
  * reference's stats files (S4/A1, SURVEY.md §2.1/§2.4): DREAM runs
  * each candidate subquery once, records result size and wall-clock
  * runtime keyed by a canonical condition key
  * (PlanCostEstimator.cpp:585-655, 1053-1085; format: the
  * LUBMStats-RDFDB stats files), and reuses the measurements on later
  * plans. Catalyst's AQE already re-plans on measured shuffle sizes
  * in-flight; this cache adds the ACROSS-RUS persistence DREAM has:
  * measured rows and seconds per query key, loadable before planning
  * (e.g. to choose a broadcast hint or salt bucket count from last
  * run's cardinality).
  *
  * Format: one `key\trows\tseconds` line per measurement, last write
  * wins on load — append-only like the reference's loader
  * (`loadResultSizeStats`), with −1 rows marking a provably-empty
  * result (entry point C's cached form,
  * LUBMStats-RDFDB/LUBMResStats-2.txt:3).
  */
final class CostStats(path: String) {

  /** Run + measure: materializes the query, appends the measurement,
    * returns (rows, seconds).
    */
  def measure(key: String, df: DataFrame): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val recordedRows = if (n == 0) -1L else n
    Files.writeString(Paths.get(path), f"$key\t$recordedRows\t$secs%.6f%n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    (n, secs)
  }

  /** Load all measurements; later lines win (reference loader
    * semantics). Empty map if the file doesn't exist yet.
    */
  def load(): Map[String, (Long, Double)] =
    if (!Files.exists(Paths.get(path))) Map.empty
    else Files.readAllLines(Paths.get(path)).asScala
      .filter(_.nonEmpty)
      .flatMap { l =>
        l.split("\t") match {
          case Array(k, rows, secs) =>
            try Some(k -> (rows.toLong, secs.toDouble))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }.toMap

  /** True if a prior measurement proves this key's result is empty —
    * the caller can short-circuit without touching data (reference
    * entry point C, Proxy.c:71-85).
    */
  def knownEmpty(key: String): Boolean =
    load().get(key).exists(_._1 == -1L)
}
