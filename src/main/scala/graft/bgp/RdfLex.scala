package graft.bgp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level accessors over the store's canonical literal spelling
  * (see [[Sparql.canonTyped]]/[[Sparql.canonLang]]): plain literals and
  * URIs are bare strings; typed literals are `"lex"^^<uri>`;
  * language-tagged literals are `"lex"@tag`. All three accessors are
  * codegen'd `CASE WHEN` + `regexp_extract` — one pass, no UDFs — and
  * they also derive the dictionary's datatype/language metadata columns
  * at encode time, so on the encoded store a LANG/DATATYPE filter is a
  * plain column predicate during the dict scan.
  */
object RdfLex {

  /** The plain lexical value (SPARQL `STR`): decoration stripped. */
  def lex(c: Column): Column =
    when(c.startsWith("\""), regexp_extract(c, "^\"([^\"]*)\"", 1))
      .otherwise(c)

  /** The language tag (SPARQL `LANG`): lowercase tag for tagged
    * literals, "" otherwise (the spec's value for untagged terms).
    */
  def lang(c: Column): Column =
    when(c.rlike("^\"[^\"]*\"@[A-Za-z]"),
      lower(regexp_extract(c, "\"@([A-Za-z0-9-]+)$", 1)))
      .otherwise(lit(""))

  /** The lexical value as a double, NULL for non-numeric lexicals —
    * the ANSI-safe spelling of a datatype-driven numeric compare (a
    * plain cast would fail the whole scan on the first URI or name in
    * the column; SPARQL instead makes a non-numeric operand an
    * expression error, which as a filter condition is simply false).
    */
  def numeric(c: Column): Column = {
    val lx = lex(c)
    when(lx.rlike("^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"), lx.cast("double"))
  }

  /** The datatype IRI (SPARQL `DATATYPE`): the declared type for typed
    * literals, rdf:langString for tagged ones, xsd:string otherwise
    * (RDF 1.1 — plain literals are xsd:string).
    */
  def datatype(c: Column): Column =
    when(c.rlike("\\^\\^<[^>]*>$"),
      regexp_extract(c, "\\^\\^<([^>]*)>$", 1))
      .when(c.rlike("^\"[^\"]*\"@[A-Za-z]"), lit(Sparql.RdfLangString))
      .otherwise(lit(Sparql.XsdNs + "string"))
}
