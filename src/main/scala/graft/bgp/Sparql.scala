package graft.bgp

/** SPARQL BGP front-end matching the reference's grammar.
  *
  * The reference parses `select ?vars where { s p o . s p o }` with a
  * whitespace tokenizer, no prefixes/FILTER/OPTIONAL (extractResults /
  * extractConditions, QueryPlanner.c:933-999; `}`-trimming extractToken
  * QueryPlanner.c:1002-1015). This parser accepts the same subset:
  * `?name` = variable; `<uri>` / `"literal"` / bare token = constant.
  */
object Sparql {

  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Const(value: String) extends Term

  /** One triple pattern (reference `Condition`, Structs.h:41-48). */
  final case class TriplePattern(s: Term, p: Term, o: Term) {
    def vars: Seq[String] = Seq(s, p, o).collect { case Var(n) => n }
  }

  final case class BgpQuery(select: Seq[String], patterns: Seq[TriplePattern])

  /** Parse the reference subset. Throws IllegalArgumentException on
    * queries outside the grammar.
    */
  def parse(query: String): BgpQuery = {
    val lower = query.trim
    val selIdx = indexOfWord(lower, "select")
    val whereIdx = indexOfWord(lower, "where")
    require(selIdx == 0, s"query must start with 'select': $query")
    require(whereIdx > 0, s"query must contain 'where': $query")

    val selectVars = lower.substring("select".length, whereIdx)
      .split("\\s+").filter(_.nonEmpty).toSeq
      .map { tok =>
        require(tok.startsWith("?"), s"SELECT clause allows only ?vars, got: $tok")
        tok.drop(1)
      }

    val body0 = lower.substring(whereIdx + "where".length).trim
    require(body0.startsWith("{") && body0.endsWith("}"),
      s"where clause must be braced: $query")
    val body = body0.drop(1).dropRight(1).trim

    // patterns separated by '.' tokens; tokens separated by whitespace.
    // A '.' only counts as a separator when it stands alone (URIs and
    // literals may contain dots).
    val patterns = body.split("\\s+\\.\\s+|\\s+\\.$").toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map { pat =>
        // tokens: <uri> | "literal" (may contain spaces) | bare word
        val toks = "\"[^\"]*\"|<[^>]*>|\\S+".r.findAllIn(pat).toSeq
        require(toks.length == 3, s"triple pattern needs 3 terms, got '${pat}'")
        TriplePattern(term(toks(0)), term(toks(1)), term(toks(2)))
      }
    require(patterns.nonEmpty, s"empty BGP: $query")

    val known = patterns.flatMap(_.vars).toSet
    selectVars.foreach(v =>
      require(known.contains(v), s"SELECT var ?$v not bound in any pattern"))
    BgpQuery(selectVars, patterns)
  }

  private def term(tok: String): Term =
    if (tok.startsWith("?")) Var(tok.drop(1))
    else if (tok.startsWith("<") && tok.endsWith(">")) Const(tok.drop(1).dropRight(1))
    else if (tok.startsWith("\"") && tok.endsWith("\"") && tok.length >= 2)
      Const(tok.drop(1).dropRight(1))
    else Const(tok)

  private def indexOfWord(s: String, w: String): Int = {
    val i = s.toLowerCase.indexOf(w)
    i
  }
}
