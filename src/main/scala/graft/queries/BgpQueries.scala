package graft.queries

import graft.GQuery
import graft.bgp.{BgpPlanner, TripleStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SPARQL BGP queries — the reference's core surface (SURVEY.md §3),
  * exercised over an RDF view of the star schema so the DuckDB oracle
  * can verify BGP joins as relational equi-joins (FIXTURES.md §B).
  *
  * Shapes mirror the reference fixtures: a star query with a constant
  * endpoint (LUBM Q4, LUBMQueries/Query4:1), a cyclic/triangle query
  * (LUBM Q2, LUBMQueries/Query2:1), and the provably-empty path
  * (entry point C, Proxy.c:71-85).
  */
object BgpQueries {

  // Memoize the store OBJECT per (session, dir) — building the slice
  // DAG is cheap but not free. No Spark-level cache(): each pattern
  // reads only its predicate slice, a pruned 2-column parquet scan,
  // which at bench scale beats materializing a store-wide string cache.
  private val storeCache =
    scala.collection.mutable.Map.empty[(SparkSession, String, Boolean), TripleStore]

  private def store(s: SparkSession, dir: String, encoded: Boolean): TripleStore =
    storeCache.synchronized {
      storeCache.getOrElseUpdate((s, dir, encoded), {
        val base = TripleStore.fromStarSchema(s, dir)
        if (encoded) {
          // the dictionary is the one derived artifact a real engine
          // keeps materialized (RDF-3X does exactly this on disk) —
          // cache it; slices stay as pruned scans
          val enc = TripleStore.encode(base)
          enc.copy(dict = enc.dict.map(_.cache()))
        } else base
      })
    }

  private def bgp(sparql: String, encoded: Boolean = false)(
      s: SparkSession, dir: String): DataFrame =
    BgpPlanner.query(store(s, dir, encoded), sparql)

  val starQuery: String =
    """select ?c ?seg ?nm where {
      | ?c rdf:type "Customer" .
      | ?c mktsegment ?seg .
      | ?c nationkey ?n .
      | ?n name ?nm .
      | ?n regionkey ?r .
      | ?r name "ASIA" }""".stripMargin

  private val starOracle =
    """SELECT concat('customer:', c_custkey) AS c, n_name AS nm, c_mktsegment AS seg
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'""".stripMargin

  def all: Seq[GQuery] = Seq(

    // LUBM Q4 analog: star on ?c/?n with a constant leaf
    GQuery("q30_bgp_star", bgp(starQuery), Some(starOracle), headline = true),

    // LUBM Q2 analog: cyclic (triangle) join over lineitem-derived edges
    GQuery(
      "q31_bgp_triangle",
      bgp("""select ?o ?p ?s where {
            | ?o contains ?p .
            | ?o suppliedby ?s .
            | ?s supplies ?p .
            | ?o status "F" }""".stripMargin),
      Some("""WITH cont AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |  supb AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
             |  supp AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
             |  ford AS (SELECT o_orderkey AS ok FROM orders WHERE o_orderstatus = 'F')
             |SELECT concat('order:', cont.ok) AS o, concat('part:', cont.pk) AS p,
             |       concat('supplier:', supb.sk) AS s
             |FROM cont
             |JOIN supb ON cont.ok = supb.ok
             |JOIN supp ON supp.sk = supb.sk AND supp.pk = cont.pk
             |JOIN ford ON ford.ok = cont.ok""".stripMargin),
      headline = true),

    // entry point C analog: provably-empty BGP → 0 rows, schema kept
    GQuery(
      "q32_bgp_empty",
      bgp("""select ?c ?n where {
            | ?c mktsegment "NONEXISTENT" .
            | ?c nationkey ?n }""".stripMargin),
      Some("""SELECT concat('customer:', c_custkey) AS c,
             |       concat('nation:', c_nationkey) AS n
             |FROM customer WHERE c_mktsegment = 'NONEXISTENT'""".stripMargin)),

    // same star query through the dictionary-encoded path (xxhash64 IDs
    // + broadcast-dict decode) — must be observationally identical
    GQuery("q33_bgp_dict_encoded", bgp(starQuery, encoded = true), Some(starOracle)),

    // grammar extension: OPTIONAL ≡ left join (nations with their
    // region name, suppliers optional)
    GQuery(
      "q61_bgp_optional",
      bgp("""select ?n ?rn ?s where {
            | ?n rdf:type "Nation" .
            | ?n regionkey ?r .
            | ?r name ?rn .
            | OPTIONAL { ?s nationkey ?n . ?s rdf:type "Supplier" } }""".stripMargin),
      Some("""SELECT concat('nation:', n_nationkey) AS n, r_name AS rn,
             |  'supplier:' || s_suppkey AS s
             |FROM nation
             |JOIN region ON n_regionkey = r_regionkey
             |LEFT JOIN supplier ON s_nationkey = n_nationkey""".stripMargin)),

    // grammar extension: FILTER comparison + SELECT DISTINCT
    GQuery(
      "q62_bgp_filter_distinct",
      bgp("""select distinct ?seg where {
            | ?c mktsegment ?seg .
            | ?c rdf:type "Customer" .
            | FILTER (?seg != "BUILDING") }""".stripMargin),
      Some("""SELECT DISTINCT c_mktsegment AS seg
             |FROM customer WHERE c_mktsegment <> 'BUILDING'""".stripMargin))
  )
}
