package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact numeric aggregation helpers for oracle parity.
  *
  * Summing doubles is order-dependent (Spark's partial aggregates and
  * DuckDB's sequential scan accumulate in different orders), and even
  * per-row double→decimal casts diverge between engines (Spark rounds
  * the shortest decimal representation via BigDecimal.valueOf, DuckDB
  * rounds the true binary value). The engine-proof pattern:
  *
  *   sum(floor(x * 10000 + 0.5)) / 10000
  *
  * floor on a binary double is exact and identical everywhere, the
  * scaled values are integral so their sum is exact (order-independent)
  * up to 2^53, and the final division is a single identical IEEE op.
  * Effective semantics: sum of x rounded half-up to 4 decimals.
  */
object OracleNum {

  /** Order-independent 4-decimal sum of a double expression (DoubleType). */
  def dsum(c: Column): Column = (sum(floor(c * 10000 + 0.5)) / 10000).cast("double")

  /** Order-independent mean of a double expression (DoubleType). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Engine-proof round-half-up of a row-level double to `digits`
    * decimals. Built-in `round()` disagrees between engines when the
    * true binary value sits at a decimal half (Spark rounds the
    * shortest decimal representation, DuckDB the binary value — one
    * cent off on ~1/1000 money rows, first seen at sf0.1 in q02);
    * floor(x·10^d + 0.5) applies identical IEEE ops everywhere.
    */
  def dround(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    (floor(c * p + 0.5) / p).cast("double")
  }

  /** DuckDB spelling of [[dround]]. */
  def droundSql(e: String, digits: Int): String = {
    val p = BigInt(10).pow(digits)
    s"floor(($e) * $p + 0.5) / $p"
  }

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(e: String): String = s"sum(floor(($e) * 10000 + 0.5)) / 10000"

  /** DuckDB spelling of [[davg]]. */
  def davgSql(e: String): String = s"${dsumSql(e)} / count(*)"
}
