package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingestion beyond parquet: JSONL (the interchange
  * format crawl pipelines actually emit) and CSV, both read with an
  * EXPLICIT schema — schema inference is a full data scan at 100 TB
  * and can silently widen types between snapshots — and with corrupt
  * records isolated into a side relation instead of failing the job
  * or vanishing: a curation pipeline needs the malformed-row count as
  * a first-class signal (cf. q167's reject attribution).
  *
  * Mechanically each format is a plain text scan plus a codegen'd
  * from_json/from_csv parse whose schema carries the corrupt-capture
  * field as an ORDINARY struct column — unlike the DataFrameReader's
  * internal `_corrupt_record`, this shape survives column pruning and
  * any downstream query plan.
  */
object DocIO {

  /** The documents table contract (TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val corruptCol = "_corrupt"
  private def withCorrupt(s: StructType): StructType =
    s.add(StructField(corruptCol, StringType))
  private val parseOpts = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)

  private def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val good = parsed.filter(col(s"r.$corruptCol").isNull)
      .select(docSchema.fieldNames.map(n => col(s"r.$n")): _*)
    val bad = parsed.filter(col(s"r.$corruptCol").isNotNull)
      .select(col("value").as("line"))
    (good, bad)
  }

  /** Rows that parsed clean + the malformed remainder, one pass:
    * (clean-with-contract-schema, corrupt raw lines).
    */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read.text(path).select(
      from_json(col("value"), withCorrupt(docSchema), parseOpts).as("r"),
      col("value")))

  /** CSV with a header line, quoted fields, and the same corrupt
    * isolation. The header is recognized textually (the schema is
    * enforced, never inferred from it).
    */
  def readCsv(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val header = docSchema.fieldNames.mkString(",")
    split(spark.read.text(path)
      .filter(col("value") =!= header)
      .select(from_csv(col("value"), withCorrupt(docSchema),
        parseOpts + ("quote" -> "\"") + ("escape" -> "\"")).as("r"),
        col("value")))
  }

  /** JSONL writer for round-tripping curated corpora out to downstream
    * consumers that don't speak parquet. Shard count is the caller's
    * partitioning; no coalesce(1) bottleneck hidden here.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** CSV writer paired with [[readCsv]]: header line, quote-when-
    * needed with doubled-quote escaping (the options readCsv parses
    * with), so fields containing the delimiter or quotes survive the
    * round trip. CSV stays line-per-record — embedded newlines are
    * the caller's contract to strip (readCsv is a line-based scan by
    * design: splittable and parallel at 100 TB, which multiLine CSV
    * is not).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** ORC round-trip for warehouses standardized on ORC rather than
    * parquet. Spark's native vectorized ORC reader/writer gives the
    * same predicate-pushdown + column-pruning contract as parquet;
    * the read enforces the contract schema rather than trusting file
    * footers (a snapshot written with a widened type would otherwise
    * leak the widening downstream).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Sharded corpus writer — the output side of the q152 shard
    * manifest: `repartition(shardCol)` makes each shard exactly one
    * task's output (no tiny-file explosion from every task writing
    * every shard), `sortWithinPartitions` clusters rows by `sortCol`
    * inside each file so downstream range scans and parquet min/max
    * row-group pruning work, and `partitionBy` encodes the shard in
    * the directory layout so a consumer reads one shard without
    * listing the rest. At 100 TB the repartition is one full shuffle
    * — the price of bounded file counts — and shard count should be
    * sized so a shard ≈ a few GB, not fixed at 16.
    */
  def writeShardedCorpus(df: DataFrame, path: String, shardCol: String,
      sortCol: String): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(sortCol))
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
}
