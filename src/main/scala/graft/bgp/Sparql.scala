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
  /** One-or-more property path `p+` (SPARQL 1.1) — only valid at the
    * predicate position; the planner evaluates the slice's transitive
    * closure.
    */
  final case class PathPlus(predicate: String) extends Term
  /** Zero-or-more property path `p*` (SPARQL 1.1) — `p+` ∪ identity
    * over the slice's vertex set. Only valid at the predicate position.
    */
  final case class PathStar(predicate: String) extends Term
  /** Inverse property path `^p` (SPARQL 1.1) — matches with subject and
    * object swapped. Only valid at the predicate position.
    */
  final case class PathInverse(predicate: String) extends Term
  /** Alternation path `p1|p2|...` (SPARQL 1.1) — union of the predicate
    * slices. Only valid at the predicate position.
    */
  final case class PathAlt(predicates: Seq[String]) extends Term

  /** One triple pattern (reference `Condition`, Structs.h:41-48). */
  final case class TriplePattern(s: Term, p: Term, o: Term) {
    def vars: Seq[String] = Seq(s, p, o).collect { case Var(n) => n }
  }

  /** A value-level restriction: `FILTER (?v op value)` or
    * `FILTER (?v op ?w)` (`rhsVar` = true → `value` names the right
    * variable). `numeric` = the literal parsed as a number, so compare
    * numerically.
    */
  final case class FilterExpr(variable: String, op: String, value: String,
      numeric: Boolean, rhsVar: Boolean = false)

  /** Extended BGP: the reference grammar (patterns only) plus the
    * standard SPARQL extensions the reference lacks — DISTINCT,
    * FILTER comparisons, OPTIONAL blocks, UNION groups (SURVEY.md §2.2
    * "Absent" rows; planner maps them to distinct / post-join filter /
    * left-outer join / bag union).
    *
    * `unions`: each element is one `{A} UNION {B} [UNION {C}…]` group —
    * a list of branches, each branch a pattern list. All branches of a
    * group must bind the same variable set.
    */
  final case class BgpQuery(
      select: Seq[String],
      patterns: Seq[TriplePattern],
      optionals: Seq[Seq[TriplePattern]] = Nil,
      filters: Seq[FilterExpr] = Nil,
      distinct: Boolean = false,
      unions: Seq[Seq[Seq[TriplePattern]]] = Nil,
      minuses: Seq[Seq[TriplePattern]] = Nil)

  private val optionalRe = "(?is)optional\\s*\\{([^}]*)\\}".r
  private val minusRe = "(?is)minus\\s*\\{([^}]*)\\}".r
  private val unionChainRe = "(?is)\\{[^{}]*\\}(?:\\s*union\\s*\\{[^{}]*\\})+".r
  private val braceBlockRe = "(?s)\\{([^{}]*)\\}".r
  private val filterRe = "(?is)filter\\s*\\(([^)]*)\\)".r
  private val filterExprRe = "^\\?(\\S+)\\s*(>=|<=|!=|=|>|<)\\s*(.+)$".r
  private val numberRe = "^-?\\d+(\\.\\d+)?$".r

  /** Parse the reference subset + extensions. Throws
    * IllegalArgumentException on queries outside the grammar.
    */
  def parse(query: String): BgpQuery = {
    val lower = query.trim
    val selIdx = indexOfWord(lower, "select")
    val whereIdx = indexOfWord(lower, "where")
    require(selIdx == 0, s"query must start with 'select': $query")
    require(whereIdx > 0, s"query must contain 'where': $query")

    val selClause = lower.substring("select".length, whereIdx)
      .split("\\s+").filter(_.nonEmpty).toSeq
    val isDistinct = selClause.headOption.exists(_.equalsIgnoreCase("distinct"))
    val selectVars = (if (isDistinct) selClause.tail else selClause)
      .map { tok =>
        require(tok.startsWith("?"), s"SELECT clause allows only ?vars, got: $tok")
        tok.drop(1)
      }

    val body0 = lower.substring(whereIdx + "where".length).trim
    require(body0.startsWith("{") && body0.endsWith("}"),
      s"where clause must be braced: $query")
    val bodyFull = body0.drop(1).dropRight(1).trim

    // pull extension clauses out first; the remainder is the
    // reference's plain dot-separated pattern list. OPTIONAL blocks go
    // first so a `{...}` following the keyword is never misread as a
    // UNION branch.
    val optionals = optionalRe.findAllMatchIn(bodyFull)
      .map(m => parsePatterns(m.group(1))).toSeq
    val body0b = optionalRe.replaceAllIn(bodyFull, "")
    val minuses = minusRe.findAllMatchIn(body0b)
      .map(m => parsePatterns(m.group(1))).toSeq
    val body1 = minusRe.replaceAllIn(body0b, "")
    val unions = unionChainRe.findAllIn(body1).toSeq
      .map(chain => braceBlockRe.findAllMatchIn(chain)
        .map(m => parsePatterns(m.group(1))).toSeq)
    unions.foreach { branches =>
      val varSets = branches.map(_.flatMap(_.vars).toSet)
      require(varSets.distinct.size == 1,
        s"UNION branches must bind the same variables, got: $varSets")
    }
    val filters = filterRe.findAllMatchIn(bodyFull).map { m =>
      m.group(1).trim match {
        case filterExprRe(v, op, raw) =>
          term(raw.trim) match {
            case Var(w) => FilterExpr(v, op, w, numeric = false, rhsVar = true)
            case Const(c) => FilterExpr(v, op, c, numberRe.matches(raw.trim))
            case other =>
              throw new IllegalArgumentException(
                s"FILTER right side must be a constant or variable, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported FILTER: $other")
      }
    }.toSeq
    val body = filterRe.replaceAllIn(
      unionChainRe.replaceAllIn(body1, ""), "").trim

    val patterns = parsePatterns(body)
    require(patterns.nonEmpty || unions.nonEmpty, s"empty BGP: $query")
    val allPatterns =
      patterns ++ optionals.flatten ++ unions.flatten.flatten ++ minuses.flatten
    allPatterns.foreach { p =>
      Seq(p.s, p.o).foreach(t =>
        require(t.isInstanceOf[Var] || t.isInstanceOf[Const],
          s"property paths are only valid at the predicate position: $p"))
    }

    // MINUS blocks restrict, never bind: SELECT/FILTER vars must come
    // from the positive patterns
    val known =
      (patterns ++ optionals.flatten ++ unions.flatten.flatten).flatMap(_.vars).toSet
    selectVars.foreach(v =>
      require(known.contains(v), s"SELECT var ?$v not bound in any pattern"))
    filters.foreach { f =>
      require(known.contains(f.variable), s"FILTER var ?${f.variable} not bound")
      if (f.rhsVar)
        require(known.contains(f.value), s"FILTER var ?${f.value} not bound")
    }
    BgpQuery(selectVars, patterns, optionals, filters, isDistinct, unions,
      minuses)
  }

  /** Dot-separated triple patterns; a '.' only separates when it
    * stands alone (URIs and literals may contain dots).
    */
  private def parsePatterns(body: String): Seq[TriplePattern] =
    body.split("\\s+\\.\\s+|\\s+\\.$|^\\.\\s+").toSeq
      .map(_.trim).filter(s => s.nonEmpty && s != ".")
      .map { pat =>
        // tokens: <uri> | "literal" (may contain spaces) | bare word
        val toks = "\"[^\"]*\"|<[^>]*>|\\S+".r.findAllIn(pat).toSeq
        require(toks.length == 3, s"triple pattern needs 3 terms, got '${pat}'")
        TriplePattern(term(toks(0)), term(toks(1)), term(toks(2)))
      }

  private def term(tok: String): Term =
    if (tok.startsWith("?")) Var(tok.drop(1))
    else if (tok.endsWith("+") && tok.length > 1) term(tok.dropRight(1)) match {
      case Const(p) => PathPlus(p)
      case other => other
    }
    else if (tok.endsWith("*") && tok.length > 1) term(tok.dropRight(1)) match {
      case Const(p) => PathStar(p)
      case other => other
    }
    else if (tok.startsWith("^") && tok.length > 1) term(tok.drop(1)) match {
      case Const(p) => PathInverse(p)
      case other => other
    }
    // alternation applies to bare-token paths only: a URI or quoted
    // literal containing '|' stays a constant
    else if (tok.contains("|") && !tok.startsWith("<") && !tok.startsWith("\"")
        && tok.length > 1)
      PathAlt(tok.split("\\|").toSeq.map(t => term(t) match {
        case Const(p) => p
        case other => throw new IllegalArgumentException(
          s"alternation branches must be plain predicates, got $other in $tok")
      }))
    else if (tok.startsWith("<") && tok.endsWith(">")) Const(tok.drop(1).dropRight(1))
    else if (tok.startsWith("\"") && tok.endsWith("\"") && tok.length >= 2)
      Const(tok.drop(1).dropRight(1))
    else Const(tok)

  private def indexOfWord(s: String, w: String): Int = {
    val i = s.toLowerCase.indexOf(w)
    i
  }
}
