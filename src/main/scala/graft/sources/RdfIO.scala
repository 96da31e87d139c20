package graft.sources

import graft.bgp.TripleStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** RDF I/O surface — the reference's sources and sinks, Spark-native.
  *
  *  - S1 query-file source (Client.c:14, readFile ProxyUtil.c:103-129):
  *    [[readQuery]].
  *  - Base-data ingest (the reference delegates storage to RDF-3X,
  *    loaded from N-Triples dumps per the RDF-3X toolchain):
  *    [[readNTriples]] → [[TripleStore]].
  *  - S5 result sink (Proxy.c:71-85,166-177,237-255): [[writeResult]]
  *    materializes a result DataFrame as text with the reference's
  *    `<empty result>` sentinel for the 0-row case (golden file
  *    Result-Q2:1); [[writeTable]] is the parquet path a warehouse
  *    actually uses.
  */
object RdfIO {

  /** Parse one N-Triples line → (s, p, o); tolerates `<uri>` terms,
    * `"literal"` objects — with an optional `^^<datatype>` or `@lang`
    * suffix, preserved in the store's canonical spelling
    * ([[graft.bgp.Sparql.canonTyped]]/[[graft.bgp.Sparql.canonLang]]) —
    * blank nodes (`_:b`, kept as opaque node ids), and trailing `.`.
    * Returns null for comments/blank lines (filtered by the caller).
    */
  private val ntLine =
    ("""^\s*(?:<([^>]*)>|(\S+))\s+(?:<([^>]*)>|(\S+))\s+(?:<([^>]*)>""" +
      """|"((?:[^"\\]|\\.)*)"(\^\^<[^>]*>|@[A-Za-z]+(?:-[A-Za-z0-9]+)*)?""" +
      """|(\S+))\s*\.\s*$""").r

  /** Read an N-Triples file into a (vertically partitioned) triple
    * store. The parse is a per-line map over a distributed text scan —
    * no driver-side work; malformed lines are dropped (count them via
    * the returned store if strictness is needed).
    */
  def readNTriples(spark: SparkSession, path: String): TripleStore =
    TripleStore.fromTriples(ntriplesDF(spark, path))

  /** The parsed `(s, p, o)` relation of an N-Triples file — the store
    * build above and SPARQL Update's `LOAD` share this one parser.
    */
  def ntriplesDF(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .flatMap(parseNtLine _)
      .toDF("s", "p", "o")
  }

  /** STREAMING N-Triples ingest: dump files landing in `path` parse
    * incrementally — the same per-line parser as [[ntriplesDF]], lifted
    * over `readStream`. Compose with a `p`-partitioned parquet sink for
    * streaming load into the store's vertical layout (see
    * [[TurtleIO.turtleStream]] for the pattern).
    */
  def ntriplesStream(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.readStream.text(path).as[String]
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .flatMap(parseNtLine _)
      .toDF("s", "p", "o")
  }

  /** One N-Triples line's triple, None when malformed/comment (also
    * the Graph Store Protocol's payload parser — see
    * [[graft.bgp.SparqlServer]]).
    */
  private[graft] def parseNtLine(l: String): Option[(String, String, String)] =
    l match {
      case ntLine(su, sb, pu, pb, ou, olit, odeco, ob) =>
        val s = if (su != null) su else sb
        val p = if (pu != null) pu else pb
        val o =
          if (ou != null) ou
          else if (olit != null) {
            if (odeco == null) olit
            else if (odeco.startsWith("^^<"))
              graft.bgp.Sparql.canonTyped(olit, odeco.drop(3).dropRight(1))
            else graft.bgp.Sparql.canonLang(olit, odeco.drop(1))
          }
          else ob
        Some((s, p, o))
      case _ => None
    }

  /** S1: read a SPARQL query file (driver-side — query text is tiny). */
  def readQuery(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  /** S5: text result sink with the reference's empty sentinel.
    * Row order is not meaningful (SURVEY.md §5 — the reference's own
    * golden output is unordered post-decode).
    */
  def writeResult(df: DataFrame, path: String): Long = {
    val cols = df.columns.sorted
    val canon = df.select(cols.map(col): _*)
    val n = canon.count()
    if (n == 0) {
      import df.sparkSession.implicits._
      df.sparkSession.createDataset(Seq("<empty result>"))
        .write.mode(SaveMode.Overwrite).text(path)
    } else {
      canon.select(concat_ws("\t", cols.map(c => col(c).cast("string")): _*).as("value"))
        .write.mode(SaveMode.Overwrite).text(path)
    }
    n
  }

  /** The warehouse-native sink: parquet, optionally partitioned. */
  def writeTable(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
