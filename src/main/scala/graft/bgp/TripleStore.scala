package graft.bgp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF triple store over Spark.
  *
  * The reference keeps its triples inside the external RDF-3X binary
  * (SURVEY.md §1.1) with dictionary-encoded uint64 IDs and decodes
  * lexical values only at the result edge (Proxy.c:211-224). Here:
  *
  *  - string form: `triples(s,p,o: String)` — the analysis-friendly
  *    surface; set semantics (RDF triples are a set, so derivation
  *    dedups);
  *  - encoded form: `triples(s,p,o: Long)` + `dict(id, value)` —
  *    joins run on longs (reference parity; also ~8× narrower shuffle
  *    rows at 100 TB), decode is one broadcast-dict join per output
  *    column. IDs are xxhash64 of the lexical form: deterministic and
  *    embarrassingly parallel — no global sort or zipWithIndex
  *    bottleneck at load, unlike a dense-ID dictionary build.
  */
final case class TripleStore(triples: DataFrame, dict: Option[DataFrame]) {
  def encoded: Boolean = dict.isDefined
}

object TripleStore {

  /** Derive a string-form triple store from the driver's star schema.
    * Edge inventory mirrors an RDF view of TPC-H: entity URIs like
    * `customer:17`, plus value literals. Set semantics via distinct().
    */
  def fromStarSchema(spark: SparkSession, dir: String): TripleStore = {
    import graft.Tables.t
    def uri(prefix: String, c: org.apache.spark.sql.Column) =
      concat(lit(prefix), lit(":"), c.cast("string"))

    val cust = t(spark, dir, "customer")
    val sup = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    val reg = t(spark, dir, "region")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")

    def tri(df: DataFrame, s: org.apache.spark.sql.Column, p: String,
        o: org.apache.spark.sql.Column): DataFrame =
      df.select(s.as("s"), lit(p).as("p"), o.cast("string").as("o"))

    val parts = Seq(
      tri(cust, uri("customer", col("c_custkey")), "rdf:type", lit("Customer")),
      tri(cust, uri("customer", col("c_custkey")), "nationkey", uri("nation", col("c_nationkey"))),
      tri(cust, uri("customer", col("c_custkey")), "mktsegment", col("c_mktsegment")),
      tri(cust, uri("customer", col("c_custkey")), "name", col("c_name")),
      tri(sup, uri("supplier", col("s_suppkey")), "rdf:type", lit("Supplier")),
      tri(sup, uri("supplier", col("s_suppkey")), "nationkey", uri("nation", col("s_nationkey"))),
      tri(sup, uri("supplier", col("s_suppkey")), "name", col("s_name")),
      tri(nat, uri("nation", col("n_nationkey")), "rdf:type", lit("Nation")),
      tri(nat, uri("nation", col("n_nationkey")), "name", col("n_name")),
      tri(nat, uri("nation", col("n_nationkey")), "regionkey", uri("region", col("n_regionkey"))),
      tri(reg, uri("region", col("r_regionkey")), "name", col("r_name")),
      tri(ord, uri("order", col("o_orderkey")), "rdf:type", lit("Order")),
      tri(ord, uri("order", col("o_orderkey")), "custkey", uri("customer", col("o_custkey"))),
      tri(ord, uri("order", col("o_orderkey")), "status", col("o_orderstatus")),
      tri(li, uri("order", col("l_orderkey")), "contains", uri("part", col("l_partkey"))),
      tri(li, uri("order", col("l_orderkey")), "suppliedby", uri("supplier", col("l_suppkey"))),
      tri(li, uri("supplier", col("l_suppkey")), "supplies", uri("part", col("l_partkey"))))

    TripleStore(parts.reduce(_ unionByName _).distinct(), None)
  }

  /** Dictionary-encode a string-form store: triples → xxhash64 IDs,
    * dict → (id, value). The dict is built from the union of all
    * positions — one distinct over the data, no driver collect.
    */
  def encode(store: TripleStore): TripleStore = {
    val tr = store.triples
    val dict = tr.select(col("s").as("value"))
      .unionByName(tr.select(col("p").as("value")))
      .unionByName(tr.select(col("o").as("value")))
      .distinct()
      .select(xxhash64(col("value")).as("id"), col("value"))
    val enc = tr.select(
      xxhash64(col("s")).as("s"),
      xxhash64(col("p")).as("p"),
      xxhash64(col("o")).as("o"))
    TripleStore(enc, Some(dict))
  }
}
