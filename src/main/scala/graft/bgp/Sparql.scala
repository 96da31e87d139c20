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

  // ——— RDF 1.1 lexical forms (typed literals, language tags, blank
  // nodes) — parity-plus: the reference grammar (QueryPlanner.c:933-999)
  // tokenizes only <uri> / "literal" / ?var, but any real RDF dataset
  // (LUBM's full form included) carries these ———

  val XsdNs = "http://www.w3.org/2001/XMLSchema#"
  val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  /** Query-pattern blank nodes (`_:b`) are non-selectable variables
    * scoped to the query (SPARQL 1.1 §4.1.4) — they desugar to vars
    * under this reserved prefix, like sequence-path intermediates.
    */
  val BNodeVarPrefix = "__bn_"

  private val NumericXsd = Set(
    "integer", "decimal", "double", "float", "long", "int", "short",
    "byte", "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte")

  // the quoted-lexical arm accepts backslash escapes (`\"`, `\\`) per
  // SPARQL grammar rule [145] — captured raw, unescaped by unescapeLit
  private[bgp] val typedLitRe =
    "^\"((?:[^\"\\\\]|\\\\.)*)\"\\^\\^(?:<([^>]*)>|([A-Za-z][\\w.-]*:[\\w.-]+))$".r
  private[bgp] val langLitRe =
    "^\"((?:[^\"\\\\]|\\\\.)*)\"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)$".r

  /** Undo literal backslash escapes (`\"` `\\` `\n` `\t`) — applied
    * once at parse time so stored/compared lexical forms hold the
    * actual characters; identity for escape-free strings.
    */
  private[graft] def unescapeLit(s: String): String =
    if (!s.contains('\\')) s
    else {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          b += (s.charAt(i + 1) match {
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case other => other
          })
          i += 2
        } else { b += c; i += 1 }
      }
      b.toString
    }

  /** Term tokenization shared by triple patterns and VALUES blocks:
    * a quoted literal with an optional `^^datatype` / `@lang` suffix
    * (spaces allowed inside the quotes), a `<uri>`, or a bare word.
    */
  private[bgp] val termTokenRe =
    ("\"(?:[^\"\\\\]|\\\\.)*\"(?:\\^\\^<[^>]*>|\\^\\^[A-Za-z][\\w.-]*:[\\w.-]+" +
      "|@[A-Za-z]+(?:-[A-Za-z0-9]+)*)?|<[^>]*>|\\S+").r

  /** Canonical datatype IRI: the well-known `xsd:` prefix expands even
    * without a PREFIX declaration; full IRIs and other CURIEs pass
    * through (declared prefixes were expanded before the tokenizer).
    */
  def datatypeUri(raw: String): String =
    if (raw.startsWith("xsd:")) XsdNs + raw.drop(4) else raw

  def isNumericDatatype(uri: String): Boolean =
    uri.startsWith(XsdNs) && NumericXsd(uri.stripPrefix(XsdNs))

  /** Canonical stored/matched form of a typed literal: `xsd:string`
    * collapses to the plain lexical (RDF 1.1 literal identity); every
    * other datatype keeps the decorated N-Triples surface form with
    * the datatype expanded, so query constants and ingested data meet
    * on one spelling.
    */
  def canonTyped(lex0: String, dtRaw: String): String = {
    val lex = unescapeLit(lex0)
    val dt = datatypeUri(dtRaw)
    if (dt == XsdNs + "string") lex else "\"" + lex + "\"^^<" + dt + ">"
  }

  /** Canonical language-tagged form; tags compare case-insensitively
    * (BCP 47), so they canonicalize to lowercase.
    */
  def canonLang(lex: String, lang: String): String =
    "\"" + unescapeLit(lex) + "\"@" + lang.toLowerCase
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
  /** Zero-or-one property path `p?` (SPARQL 1.1) — one step ∪ identity
    * over the slice's vertex set. Only valid at the predicate position.
    */
  final case class PathOpt(predicate: String) extends Term
  /** Alternation path `p1|p2|...` (SPARQL 1.1) — union of the predicate
    * slices. Only valid at the predicate position.
    */
  final case class PathAlt(predicates: Seq[String]) extends Term
  /** Counted repetition `p{n}` / `p{n,m}` (property-paths draft;
    * engines like Jena/Virtuoso keep it) — between `lo` and `hi` hops,
    * set semantics. Only valid at the predicate position.
    */
  final case class PathRepeat(predicate: String, lo: Int, hi: Int) extends Term
  /** Sequence path `p1/p2/...` (SPARQL 1.1 §9.1). Exists only between
    * `term` and `parsePatterns`: the parser desugars `?s p1/p2 ?o` into
    * `?s p1 ?_sqN . ?_sqN p2 ?o` with fresh intermediate variables (the
    * spec's own Join translation, §18.2.2.3), so the planner never sees
    * it. Each step may itself be any single-predicate path form.
    */
  final case class PathSeq(steps: Seq[Term]) extends Term
  /** Negated property set `!p` / `!(p1|^p2|…)` (SPARQL 1.1 §9.1, full
    * grammar incl. mixed direction): the FORWARD arm matches any
    * forward edge whose predicate is outside `predicates`, the INVERSE
    * arm any reversed edge whose predicate is outside `inverse`; a set
    * with both kinds of member is the union of the arms (§9.1), and an
    * arm exists only when it has members (`!^p` has no forward arm).
    * Only valid at the predicate position.
    */
  final case class PathNeg(predicates: Seq[String],
      inverse: Seq[String] = Nil) extends Term
  /** Grouped sequence under repetition `(p1/p2)+` / `(p1/p2)*`
    * (SPARQL 1.1 §9.1 grouped paths): the sequence composes into one
    * derived edge relation, which then closes transitively — plain
    * predicates per step. Only valid at the predicate position.
    */
  final case class PathGroupRepeat(steps: Seq[String], star: Boolean)
      extends Term

  /** Recursive property-path expression tree (SPARQL 1.1 §9.1, full
    * composition) — the general form behind the flat single-predicate
    * cases above. The flat forms stay for the spellings they cover
    * (they carry the planner's specialized evaluation and the
    * PathSeq parse-time desugar); a spelling they CANNOT express —
    * `^(p1|p2)`, `(a|b)+`, `(a+)/(b|c)`, nested groups — parses into
    * this tree and the planner evaluates it compositionally to one
    * derived edge relation (closures distributed via PathOps
    * iteration, sequences as mid-vertex hash joins, alternation as
    * bag union).
    */
  sealed trait PExpr
  object PExpr {
    final case class Link(p: String) extends PExpr
    final case class Inv(e: PExpr) extends PExpr
    final case class PSeq(es: Seq[PExpr]) extends PExpr
    final case class Alt(es: Seq[PExpr]) extends PExpr
    final case class Plus(e: PExpr) extends PExpr
    final case class Star(e: PExpr) extends PExpr
    final case class ZeroOne(e: PExpr) extends PExpr
    final case class Repeat(e: PExpr, lo: Int, hi: Int) extends PExpr
    final case class NegSet(fwd: Seq[String], inv: Seq[String]) extends PExpr

    /** Printable canonical spelling (pattern/stats keys). */
    def render(e: PExpr): String = e match {
      case Link(p) => p
      case Inv(x) => s"^(${render(x)})"
      case PSeq(es) => es.map(render).mkString("(", "/", ")")
      case Alt(es) => es.map(render).mkString("(", "|", ")")
      case Plus(x) => s"(${render(x)})+"
      case Star(x) => s"(${render(x)})*"
      case ZeroOne(x) => s"(${render(x)})?"
      case Repeat(x, lo, hi) => s"(${render(x)}){$lo,$hi}"
      case NegSet(f, i) =>
        "!(" + (f ++ i.map("^" + _)).mkString("|") + ")"
    }
  }

  /** A nested property path the flat forms can't express — carries a
    * full [[PExpr]] tree. Only valid at the predicate position.
    */
  final case class PathTree(expr: PExpr) extends Term

  /** Reserved prefix for desugared sequence-path intermediates; user
    * variables may not start with it, and `SELECT *` / UNION var-set
    * checks ignore it.
    */
  val SeqVarPrefix = "_sq"

  /** One triple pattern (reference `Condition`, Structs.h:41-48). */
  final case class TriplePattern(s: Term, p: Term, o: Term) {
    def vars: Seq[String] = Seq(s, p, o).collect { case Var(n) => n }
  }

  /** A value-level restriction: `FILTER (?v op value)` or
    * `FILTER (?v op ?w)` (`rhsVar` = true → `value` names the right
    * variable). `numeric` = the literal parsed as a number, so compare
    * numerically. `op` may also be `"regex"` (from
    * `FILTER regex(?v, "pattern")`), where `value` holds the pattern.
    */
  final case class FilterExpr(variable: String, op: String, value: String,
      numeric: Boolean, rhsVar: Boolean = false)

  /** One `FILTER (...)` clause in disjunctive normal form: the clause
    * holds iff ANY disjunct's comparisons ALL hold. A simple
    * `FILTER (?v > 3)` is one disjunct with one comparison; `&&` binds
    * tighter than `||` (SPARQL 1.1 operator precedence); parentheses
    * beyond the outer pair are not supported.
    */
  final case class FilterClause(disjuncts: Seq[Seq[FilterExpr]])

  /** BIND expression language (SPARQL 1.1 §10.1, bounded to the forms
    * the engine's string-valued store makes meaningful): variables,
    * literals, CONCAT, STRLEN, and binary arithmetic. Later BINDs may
    * reference earlier aliases (sequence scoping).
    */
  sealed trait BindExpr
  final case class BVar(name: String) extends BindExpr
  final case class BLit(value: String, numeric: Boolean) extends BindExpr
  final case class BConcat(args: Seq[BindExpr]) extends BindExpr
  final case class BCoalesce(args: Seq[BindExpr]) extends BindExpr
  final case class BStrlen(arg: BindExpr) extends BindExpr
  final case class BArith(op: String, l: BindExpr, r: BindExpr) extends BindExpr
  /** UCASE/LCASE (SPARQL 1.1 §17.4.3). */
  final case class BFunc1(fn: String, arg: BindExpr) extends BindExpr
  /** SUBSTR(?v, start[, len]) — 1-based, like the spec and SQL. */
  final case class BSubstr(arg: BindExpr, start: Int, len: Option[Int])
      extends BindExpr
  /** REPLACE(?v, "pattern", "replacement") — regex, global. */
  final case class BReplace(arg: BindExpr, pattern: String,
      replacement: String) extends BindExpr
  /** STRBEFORE/STRAFTER(?v, "needle") (SPARQL 1.1 §17.4.3.4-5):
    * the prefix/suffix around the FIRST occurrence of the needle;
    * "" when the needle does not occur.
    */
  final case class BStr2(fn: String, arg: BindExpr, needle: String)
      extends BindExpr
  /** IF(l op r, then, else) — the condition is one comparison. */
  final case class BIf(condL: BindExpr, op: String, condR: BindExpr,
      thenE: BindExpr, elseE: BindExpr) extends BindExpr
  /** One `BIND (expr AS ?alias)` clause. */
  final case class Bind(alias: String, expr: BindExpr) {
    def refs: Seq[String] = {
      def go(e: BindExpr): Seq[String] = e match {
        case BVar(n) => Seq(n)
        case BConcat(as) => as.flatMap(go)
        case BCoalesce(as) => as.flatMap(go)
        case BStrlen(a) => go(a)
        case BArith(_, l, r) => go(l) ++ go(r)
        case BFunc1(_, a) => go(a)
        case BSubstr(a, _, _) => go(a)
        case BReplace(a, _, _) => go(a)
        case BStr2(_, a, _) => go(a)
        case BIf(l, _, r, t, e) => go(l) ++ go(r) ++ go(t) ++ go(e)
        case _ => Nil
      }
      go(expr)
    }
  }

  /** One aggregate in the SELECT clause:
    * `(COUNT(?v) AS ?alias)` / `(COUNT(*) AS ?alias)` /
    * `(SUM|MIN|MAX|AVG([DISTINCT] ?v) AS ?alias)`. `variable` = None
    * for `*`; `distinct` = the SPARQL 1.1 set-form aggregate.
    */
  final case class AggExpr(op: String, variable: Option[String], alias: String,
      distinct: Boolean = false, sep: Option[String] = None)

  /** One `ORDER BY` key: `?v` / `ASC(?v)` (ascending) or `DESC(?v)`. */
  final case class OrderKey(variable: String, asc: Boolean)

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
      filters: Seq[FilterClause] = Nil,
      distinct: Boolean = false,
      unions: Seq[Seq[Seq[TriplePattern]]] = Nil,
      minuses: Seq[Seq[TriplePattern]] = Nil,
      values: Seq[(String, Seq[String])] = Nil,
      aggregates: Seq[AggExpr] = Nil,
      groupBy: Seq[String] = Nil,
      orderBy: Seq[OrderKey] = Nil,
      limit: Option[Int] = None,
      offset: Option[Int] = None,
      // index-aligned with `optionals`: FILTER clauses written INSIDE
      // the i-th OPTIONAL block, applied to that block's sub-chain
      // before the left join (SPARQL scoped-filter semantics)
      optionalFilters: Seq[Seq[FilterClause]] = Nil,
      // `FILTER [NOT] EXISTS { ... }` blocks: (negated, patterns).
      // EXISTS keeps solutions with ≥1 block match (semi join on the
      // shared vars), NOT EXISTS drops them (anti join). Unlike MINUS,
      // a var-disjoint NOT EXISTS drops EVERYTHING when the block has
      // any solution (SPARQL 1.1 §8.1.1 vs §8.3 difference).
      existsFilters: Seq[(Boolean, Seq[TriplePattern])] = Nil,
      // `HAVING (?aggAlias op number)` conjuncts, applied after the
      // aggregation
      having: Seq[FilterExpr] = Nil,
      // index-aligned with `minuses`: FILTER clauses written INSIDE the
      // i-th MINUS block, restricting which block solutions remove
      minusFilters: Seq[Seq[FilterClause]] = Nil,
      // aligned with `unions`: per-group, per-branch scoped FILTERs
      unionFilters: Seq[Seq[Seq[FilterClause]]] = Nil,
      // `BIND (expr AS ?alias)` clauses in textual order; aliases are
      // visible to FILTER / SELECT / GROUP BY / ORDER BY and to later
      // BINDs (SPARQL sequence scoping)
      binds: Seq[Bind] = Nil,
      // nested `{ SELECT ... }` sub-SELECTs (SPARQL 1.1 §12): each is
      // evaluated independently and natural-joined into the outer
      // solution on its projected variables
      subqueries: Seq[BgpQuery] = Nil,
      // multi-variable `VALUES (?a ?b) { (c1 c2) ... }` inline tables
      // (SPARQL 1.1 §10.2): each is (vars, rows); bound vars restrict,
      // unbound vars bind via the join
      valuesTables: Seq[(Seq[String], Seq[Seq[String]])] = Nil,
      // `GRAPH <g> { patterns }` / `GRAPH ?g { patterns }` blocks
      // (SPARQL 1.1 §13.3): patterns scoped to one named graph. A
      // constant term names the graph; a variable term binds it from
      // the store's quads, and every pattern of one block matches
      // within the SAME graph.
      graphBlocks: Seq[(Term, Seq[TriplePattern])] = Nil,
      // `SERVICE [SILENT] <endpoint> { group }` blocks (SPARQL 1.1
      // Federated Query §2). The body is a FULL group pattern —
      // FILTER / OPTIONAL / UNION / MINUS / VALUES work inside the
      // block (it parses through the query grammar, like update
      // WHERE). Each block evaluates against the endpoint — an
      // in-process registered TripleStore (ServiceRegistry) or a real
      // HTTP SPARQL endpoint (SparqlHttp) — and natural-joins into
      // the outer solution on its shared variables (§2.2). SILENT
      // turns an endpoint failure into the single empty solution (the
      // block stops restricting) instead of an error (§2.3).
      services: Seq[ServiceBlock] = Nil,
      // `FROM <g>` / `FROM NAMED <g>` dataset clauses (SPARQL §13.2):
      // when either is present the query's dataset is EXACTLY what the
      // clauses name — `fromGraphs`' union (RDF merge) becomes the
      // default graph, `fromNamed` the named-graph set a GRAPH block
      // may range over. Both empty = the store's own dataset.
      fromGraphs: Seq[String] = Nil,
      fromNamed: Seq[String] = Nil,
      // index-aligned with `optionals`: sub-SELECTs written INSIDE the
      // i-th OPTIONAL block (the aggregate-as-OPTIONAL idiom). Each
      // evaluates independently, joins the block's own patterns, and
      // the combined block left-joins the outer solution — hoisting to
      // `subqueries` would turn that left join into an inner join.
      optionalSubqueries: Seq[Seq[BgpQuery]] = Nil,
      // aligned with `unions`: per-group, per-branch sub-SELECTs —
      // each joins its branch's patterns before the bag union
      unionSubqueries: Seq[Seq[Seq[BgpQuery]]] = Nil,
      // aligned with `minuses`: block sub-SELECTs — they restrict
      // which solutions the MINUS removes, never bind outer vars
      minusSubqueries: Seq[Seq[BgpQuery]] = Nil,
      // aligned with `existsFilters`: sub-SELECTs inside the i-th
      // [NOT] EXISTS block — they join the block's patterns and the
      // combined relation semi/anti-joins the outer solution (the
      // block restricts, never binds)
      existsSubqueries: Seq[Seq[BgpQuery]] = Nil,
      // aligned with `graphBlocks`: sub-SELECTs inside the i-th GRAPH
      // block (constant graph terms only) — each evaluates with the
      // block's named graph as its ACTIVE graph (§13.3 ∘ §12: the
      // planner rescopes it through the FROM machinery), joins the
      // block's patterns, and exports its projection like any block
      // subquery
      graphSubqueries: Seq[Seq[BgpQuery]] = Nil) {

    /** Every nested sub-SELECT regardless of the block it lives in —
      * the planner's constant-priming / id-space bookkeeping walks all
      * of them identically.
      */
    def allSubqueries: Seq[BgpQuery] =
      subqueries ++ optionalSubqueries.flatten ++
        unionSubqueries.flatten.flatten ++ minusSubqueries.flatten ++
        existsSubqueries.flatten ++ graphSubqueries.flatten
  }

  /** One SERVICE block: `raw` is the body text exactly as written
    * (the HTTP transport ships it verbatim, VALUES appended); `query`
    * is its full-grammar parse (`select *` over the group — the
    * in-process arm plans it, and `query.select` is the block's
    * exported variable set).
    */
  final case class ServiceBlock(endpoint: String, silent: Boolean,
      raw: String, query: BgpQuery)

  private val optionalHeadRe = "(?is)\\boptional\\s*\\{".r
  private val subSelectProbeRe = "(?is)\\{\\s*select\\b".r
  private val serviceHeadRe =
    "(?is)service\\s+(silent\\s+)?(<[^>]*>|[^\\s{]+)\\s*\\{".r
  private val graphRe = "(?is)graph\\s+(\\?\\w+|<[^>]*>|[^\\s{]+)\\s*\\{([^}]*)\\}".r
  // head-only variant for the matched-brace sub-SELECT probe (graphRe's
  // [^}]-bounded body capture can't see past a nested block)
  private val graphHeadRe = "(?is)graph\\s+(\\?\\w+|<[^>]*>|[^\\s{]+)\\s*\\{".r
  private val minusHeadRe = "(?is)\\bminus\\s*\\{".r
  private val valuesRe = "(?is)values\\s+\\?(\\w+)\\s*\\{([^}]*)\\}".r
  private val valuesTupleRe =
    "(?is)values\\s*\\(((?:\\s*\\?\\w+)+)\\s*\\)\\s*\\{([^}]*)\\}".r
  // a FILTER body may contain one level of aggregate-free parens-less
  // comparisons chained with && / || — the lazy [^()]* stops at the
  // clause's closing paren
  private val filterRe = "(?is)filter\\s*\\(([^()]*)\\)".r
  // `FILTER regex(?v, "pattern"[, "flags"])` — parens-free form only,
  // so the nested parens never confuse the comparison-filter regex
  // above (whose [^()]* cannot match a parenthesized regex call).
  // Flags desugar at parse time to a Java/RE2-portable inline prefix
  // ((?i) etc.), so the planner sees a plain pattern.
  private val filterRegexRe =
    ("(?is)filter\\s+regex\\s*\\(\\s*\\?(\\w+)\\s*,\\s*\"([^\"]*)\"" +
      "(?:\\s*,\\s*\"([a-z]*)\")?\\s*\\)").r

  /** SPARQL §17.4.3.14 flags → inline modifier prefix; `i` `s` `m`
    * only (the intersection that Spark and common oracles evaluate
    * identically); anything else is a loud error, not a silent drop.
    */
  private def regexWithFlags(pattern: String, flags: String): String = {
    if (flags == null || flags.isEmpty) pattern
    else {
      val bad = flags.filterNot("ism".contains(_))
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"unsupported REGEX flags '$bad' (supported: i, s, m)")
      s"(?$flags)$pattern"
    }
  }
  // `FILTER [(]STRSTARTS|STRENDS|CONTAINS(?v, "lit")[)]` — SPARQL 1.1
  // §17.4.3 string predicates; both the bare and outer-paren spellings
  private val filterStrFnRe =
    ("(?is)filter\\s*\\(?\\s*(strstarts|strends|contains)\\s*\\(\\s*" +
      "\\?(\\w+)\\s*,\\s*\"([^\"]*)\"\\s*\\)\\s*\\)?").r
  // `FILTER (?v [NOT] IN (lit, ...))` — IN desugars to one equality
  // disjunct per element; NOT IN to one all-different conjunct
  private val filterInRe =
    "(?is)filter\\s*\\(\\s*\\?(\\w+)\\s+(not\\s+)?in\\s*\\(([^()]*)\\)\\s*\\)".r
  // `FILTER ([!]isBlank|isIRI|isURI|isLiteral|isNumeric(?v))` — the
  // §17.4.2 term tests. Blank nodes are `_:` ids; IRIs are the
  // store's `scheme:local` node ids (the only bare colon-bearing
  // terms); literals are everything else; numeric follows the same
  // lexical typing FILTER comparisons use (RdfLex.numeric).
  private val filterIsBlankRe =
    ("(?is)filter\\s*\\(\\s*(!?)\\s*" +
      "(isblank|isiri|isuri|isliteral|isnumeric)\\s*" +
      "\\(\\s*\\?(\\w+)\\s*\\)\\s*\\)").r
  // `FILTER (sameTerm(?a, ?b))` — §17.4.1.8; with one canonical
  // spelling per term, sameTerm IS equality
  private val filterSameTermRe =
    ("(?is)filter\\s*\\(?\\s*sameterm\\s*\\(\\s*\\?(\\w+)\\s*,\\s*" +
      "\\?(\\w+)\\s*\\)\\s*\\)?").r
  // `FILTER (STRLEN(?v) op n)` — SPARQL §17.4.3.2; the op composes
  // into the FilterExpr op field as "strlen<op>" so the planner's
  // dict-filter + semi-join route applies like any string predicate
  private val filterStrlenRe =
    ("(?is)filter\\s*\\(\\s*strlen\\s*\\(\\s*\\?(\\w+)\\s*\\)\\s*" +
      "(>=|<=|!=|=|>|<)\\s*(\\d+)\\s*\\)").r
  // `FILTER (BOUND(?v))` / `FILTER (!BOUND(?v))` — the OPTIONAL
  // companion (negation by failure); standalone clause form only, like
  // regex, so its nested parens never confuse filterRe
  private val filterBoundRe =
    "(?is)filter\\s*\\(\\s*(!?)\\s*bound\\s*\\(\\s*\\?(\\w+)\\s*\\)\\s*\\)".r
  // `FILTER (LANG(?v) = "fr")` — SPARQL §17.4.4.3; the empty tag ""
  // selects plain (untagged) literals per spec
  private val filterLangRe =
    ("(?is)filter\\s*\\(\\s*lang\\s*\\(\\s*\\?(\\w+)\\s*\\)\\s*" +
      "(!?=)\\s*\"([A-Za-z0-9-]*)\"\\s*\\)").r
  // `FILTER (DATATYPE(?v) = xsd:integer|<uri>)` — SPARQL §17.4.2.7
  private val filterDatatypeRe =
    ("(?is)filter\\s*\\(\\s*datatype\\s*\\(\\s*\\?(\\w+)\\s*\\)\\s*" +
      "(!?=)\\s*(<[^>]*>|[A-Za-z][\\w.-]*:[\\w.-]+)\\s*\\)").r
  // `FILTER langMatches(LANG(?v), "fr"|"*")` — SPARQL §17.4.4.2 basic
  // filtering: "*" matches any tagged literal, a range matches the tag
  // or any of its BCP 47 extensions (fr matches fr and fr-be)
  private val filterLangMatchesRe =
    ("(?is)filter\\s*\\(?\\s*langmatches\\s*\\(\\s*lang\\s*\\(\\s*" +
      "\\?(\\w+)\\s*\\)\\s*,\\s*\"([A-Za-z0-9*-]+)\"\\s*\\)\\s*\\)?").r
  // `FILTER (STR(?v) op "lit")` — SPARQL §17.4.2.5: comparison on the
  // lexical form, decoration stripped; composes to a "lex<op>" op so
  // the dict-filter + semi-join route applies
  private val filterStrCastRe =
    ("(?is)filter\\s*\\(\\s*str\\s*\\(\\s*\\?(\\w+)\\s*\\)\\s*" +
      "(>=|<=|!=|=|>|<)\\s*\"([^\"]*)\"\\s*\\)").r
  private val filterExprRe = "^\\?(\\S+)\\s*(>=|<=|!=|=|>|<)\\s*(.+)$".r
  private val numberRe = "^-?\\d+(\\.\\d+)?$".r
  // SELECT items: an aggregate `(AGG([DISTINCT] ?v|*) AS ?alias)` or a
  // plain ?var
  private val selectItemRe =
    ("(?is)\\(\\s*(count|sum|min|max|avg|group_concat|sample)\\s*\\(\\s*" +
      "(distinct\\s+)?(\\*|\\?\\w+)\\s*" +
      "(?:;\\s*separator\\s*=\\s*\"([^\"]*)\"\\s*)?\\)" +
      "\\s+as\\s+\\?(\\w+)\\s*\\)|\\?(\\w+)").r
  // FILTER [NOT] EXISTS { patterns } — extracted before UNION chains so
  // the braced block is never misread as a UNION branch
  private val existsHeadRe = "(?is)filter\\s+(not\\s+)?exists\\s*\\{".r
  // BIND (expr AS ?alias) — the expr may nest one level of parens
  // (CONCAT/STRLEN calls)
  private val bindRe =
    "(?is)bind\\s*\\(((?:[^()]|\\([^()]*\\))*?)\\s+as\\s+\\?(\\w+)\\s*\\)".r
  private val bindArithRe =
    "^(\\?\\w+|-?\\d+(?:\\.\\d+)?)\\s*([-+*/])\\s*(\\?\\w+|-?\\d+(?:\\.\\d+)?)$".r
  private val havingRe =
    "(?is)having\\s*\\(\\s*\\?(\\w+)\\s*(>=|<=|!=|=|>|<)\\s*(-?\\d+(?:\\.\\d+)?)\\s*\\)".r
  private val groupByRe = "(?is)group\\s+by((?:\\s+\\?\\w+)+)".r
  private val orderByRe =
    "(?is)order\\s+by((?:\\s+(?:(?:asc|desc)\\s*\\(\\s*\\?\\w+\\s*\\)|\\?\\w+))+)".r
  private val orderKeyRe = "(?is)(asc|desc)\\s*\\(\\s*\\?(\\w+)\\s*\\)|\\?(\\w+)".r
  private val limitRe = "(?is)limit\\s+(\\d+)".r
  private val offsetRe = "(?is)offset\\s+(\\d+)".r

  private val prefixDeclRe =
    "(?is)^\\s*prefix\\s+([A-Za-z][A-Za-z0-9_\\-]*):\\s*<([^>]*)>\\s*".r

  /** SPARQL 1.1 prologue: strip leading `PREFIX ns: <iri>` declarations
    * and expand every DECLARED prefixed name `ns:local` in the query
    * body to the full `<iri‖local>` constant. Expansion skips quoted
    * literals and existing `<...>` IRIs; colon tokens with no matching
    * declaration stay opaque (the reference's grammar is prefix-free —
    * QueryPlanner.c:933-999 — and the fixture stores key predicates
    * like `rdf:type` verbatim, so back-compat matters). Idempotent on
    * declaration-free queries.
    */
  def expandPrefixes(query: String): String = {
    var rest = query
    val decls = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var scanning = true
    while (scanning) prefixDeclRe.findPrefixMatchOf(rest) match {
      case Some(m) =>
        decls += (m.group(1) -> m.group(2)); rest = rest.substring(m.end)
      case None => scanning = false
    }
    if (decls.isEmpty) return query
    val nameRe = ("(?<![\\w?<\\-])(" +
      decls.keys.map(java.util.regex.Pattern.quote).mkString("|") +
      "):([A-Za-z0-9_.\\-]+)").r
    val sb = new StringBuilder
    var i = 0
    val n = rest.length
    while (i < n) {
      val c = rest.charAt(i)
      // a '<' opens an IRI only when a whitespace-free '>' follows AND
      // the span looks like an IRI: not starting with '?'/'=' (that is
      // `?a<?b` / `a<=b`, the comparison operator) and containing no
      // parens (an expression like `(?a<?b)/?c>` must not be swallowed)
      val iriClose =
        if (c != '<') -1
        else {
          val close = rest.indexOf('>', i + 1)
          if (close >= 0 && {
            val span = rest.substring(i + 1, close)
            span.nonEmpty && span.charAt(0) != '?' && span.charAt(0) != '=' &&
              !span.exists(ch =>
                ch.isWhitespace || ch == '(' || ch == ')' || ch == '"')
          }) close
          else -1
        }
      if (c == '"' || iriClose >= 0) {
        // copy the quoted literal / IRI verbatim, honoring backslash
        // escapes inside the literal; an unterminated quote is a
        // malformed query, not silent copy-to-end
        val close =
          if (c != '"') iriClose
          else {
            var j = i + 1
            while (j < n && rest.charAt(j) != '"') {
              if (rest.charAt(j) == '\\') j += 1 // skip the escaped char
              j += 1
            }
            if (j >= n) throw new IllegalArgumentException(
              s"unterminated string literal at offset $i: ${rest.substring(i).take(40)}")
            j
          }
        sb.append(rest.substring(i, close + 1))
        i = close + 1
      } else if (c == '<') {
        sb.append(c)
        i += 1
      } else {
        val candidates = Seq(rest.indexOf('"', i), rest.indexOf('<', i))
        val end = candidates.filter(_ >= 0).minOption.getOrElse(n)
        sb.append(nameRe.replaceAllIn(rest.substring(i, end), m =>
          java.util.regex.Matcher.quoteReplacement(
            s"<${decls(m.group(1))}${m.group(2)}>")))
        i = end
      }
    }
    sb.toString
  }

  // a SELECT item of the form `(expr AS ?alias)` whose head is NOT an
  // aggregate keyword — SPARQL 1.1 §16.1 projection expressions; expr
  // may nest one paren level (CONCAT/STRLEN/IF calls), like bindRe
  private val selectExprRe =
    "(?is)\\(\\s*((?:[^()]|\\([^()]*\\))*?)\\s+as\\s+\\?(\\w+)\\s*\\)".r

  /** SPARQL 1.1 §16.1 projection expressions, as sugar: rewrite
    * `SELECT (expr AS ?x)` to `SELECT ?x` + a trailing
    * `BIND(expr AS ?x)` inside the WHERE block. For a non-aggregating
    * query the algebra is identical (§18.2.4 evaluates SELECT
    * expressions by Extend over the group pattern's solutions — the
    * same operation as a final BIND); expressions OVER aggregate
    * aliases would need post-grouping Extend and are rejected rather
    * than silently mis-scoped. Idempotent on queries without the form.
    */
  def desugarSelectExprs(query: String): String = {
    val selIdx = indexOfWord(query.trim, "select")
    val whereIdx = indexOfWord(query.trim, "where")
    if (selIdx != 0 || whereIdx < 0) return query
    val q = query.trim
    val sel = q.substring(0, whereIdx)
    val rest = q.substring(whereIdx)
    // an item is a plain aggregate iff the WHOLE `(AGG(...) AS ?x)`
    // form matches the aggregate item grammar — `(sum(?a)/count(?a)
    // AS ?m)` starts with an aggregate keyword but is an expression,
    // and must reach the reject below, not linger unparsed
    val exprs = selectExprRe.findAllMatchIn(sel).toSeq
      .filter(m => !selectItemRe.pattern.matcher(m.matched).matches())
    if (exprs.isEmpty) return query
    require(!exprs.exists(m => aggFnRe.findFirstIn(m.group(1)).nonEmpty),
      s"projection expressions over aggregates are not supported: $query")
    var newSel = sel
    val binds = exprs.map { m =>
      newSel = newSel.replace(m.matched, s" ?${m.group(2)} ")
      s"BIND (${m.group(1).trim} AS ?${m.group(2)})"
    }
    val closeIdx = rest.lastIndexOf("}")
    require(closeIdx > 0, s"where clause must be braced: $query")
    newSel + rest.substring(0, closeIdx) + " " +
      binds.mkString(" . ") + " " + rest.substring(closeIdx)
  }

  private val aggFnRe =
    "(?is)\\b(count|sum|min|max|avg|group_concat|sample)\\s*\\(".r

  /** Parse the reference subset + extensions. Throws
    * IllegalArgumentException on queries outside the grammar.
    */
  def parse(query0: String): BgpQuery = {
    val query = desugarSelectExprs(expandPrefixes(query0))
    // query-global counter for sequence-path intermediates; the prefix
    // is reserved so desugared vars can be told apart from user vars
    val fresh = new java.util.concurrent.atomic.AtomicInteger(0)
    def parsePatterns(body: String): Seq[TriplePattern] =
      Sparql.parsePatterns(body, fresh)
    require(!query.contains(s"?$SeqVarPrefix"),
      s"variable prefix ?$SeqVarPrefix is reserved for sequence paths: $query")
    require(!query.contains(s"?$BNodeVarPrefix"),
      s"variable prefix ?$BNodeVarPrefix is reserved for blank nodes: $query")
    val lower = query.trim
    val selIdx = indexOfWord(lower, "select")
    val whereIdx = indexOfWord(lower, "where")
    require(selIdx == 0, s"query must start with 'select': $query")
    require(whereIdx > 0, s"query must contain 'where': $query")

    val selSectionF = lower.substring("select".length, whereIdx).trim
    // dataset clauses sit between the projection and WHERE (§13.2):
    // pulled out before SELECT-item matching
    val fromRe = "(?is)\\bfrom\\s+(named\\s+)?<([^>]*)>".r
    val fromClauses = fromRe.findAllMatchIn(selSectionF).toSeq
    val fromGraphs = fromClauses.filter(_.group(1) == null).map(_.group(2))
    val fromNamed = fromClauses.filter(_.group(1) != null).map(_.group(2))
    val selSection0 = fromRe.replaceAllIn(selSectionF, " ").trim
    val isDistinct = selSection0.toLowerCase.startsWith("distinct")
    val selSection =
      if (isDistinct) selSection0.drop("distinct".length) else selSection0
    // SELECT * projects every bound variable (resolved after the
    // pattern parse below)
    val selectStar = selSection.trim == "*"
    // SELECT items in order: plain ?vars and (AGG(?v) AS ?alias) forms;
    // anything the item regex doesn't consume is a syntax error
    val leftover =
      if (selectStar) "" else selectItemRe.replaceAllIn(selSection, " ").trim
    require(leftover.isEmpty,
      s"SELECT clause allows only ?vars and (AGG(?v) AS ?alias), got: $leftover")
    val items =
      if (selectStar) Nil else selectItemRe.findAllMatchIn(selSection).toSeq
    val selectVars0 = items.collect {
      case m if m.group(6) != null => m.group(6)
    }
    val aggregates = items.collect {
      case m if m.group(1) != null =>
        val arg = m.group(3)
        val v = if (arg == "*") None else Some(arg.drop(1))
        val op = m.group(1).toLowerCase
        require(v.nonEmpty || op == "count", s"only COUNT accepts *: $query")
        val dist = m.group(2) != null
        require(!dist || Set("count", "sum", "avg").contains(op),
          s"DISTINCT is supported for COUNT/SUM/AVG aggregates: $query")
        require(!dist || v.nonEmpty, s"COUNT(DISTINCT *) is not supported: $query")
        val sep = Option(m.group(4))
        require(sep.isEmpty || op == "group_concat",
          s"SEPARATOR applies only to GROUP_CONCAT: $query")
        AggExpr(op, v, m.group(5), dist, sep)
    }
    require(selectStar || selectVars0.nonEmpty || aggregates.nonEmpty,
      s"empty SELECT clause: $query")

    val body0 = lower.substring(whereIdx + "where".length).trim
    require(body0.startsWith("{"), s"where clause must be braced: $query")
    // solution modifiers follow the LAST closing brace (the WHERE
    // block's own braces nest, the modifier tail never contains one)
    val closeIdx = body0.lastIndexOf("}")
    require(closeIdx > 0, s"where clause must be braced: $query")
    val bodyFull0 = body0.substring(1, closeIdx).trim
    val tail = body0.substring(closeIdx + 1)

    // nested sub-SELECTs: balanced-brace blocks whose first token is
    // SELECT, extracted before the [^}]-based block regexes can
    // misread their inner braces; each recursively parses with the
    // full grammar (its own aggregates, modifiers, even subqueries)
    val (bodyFullS, subqueries) = extractSubqueries(bodyFull0)

    // SERVICE blocks — pulled first for the same brace-safety reason,
    // with MATCHED braces (the body is a full group pattern that may
    // nest OPTIONAL/UNION/... braces); the body keeps its raw text
    // (the HTTP transport ships it verbatim) and parses through the
    // full query grammar for the in-process arm
    val (bodyFullV, services) = {
      val out = Seq.newBuilder[ServiceBlock]
      val rem = new StringBuilder
      var rest = bodyFullS
      var more = true
      while (more) serviceHeadRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          val (inner, after) = braceBlock(rest, m.end - 1)
          val ep0 = m.group(2)
          val endpoint =
            if (ep0.startsWith("<") && ep0.endsWith(">"))
              ep0.drop(1).dropRight(1)
            else ep0
          require(inner.trim.nonEmpty, s"empty SERVICE block: $query")
          val sub = parse("select * where { " + inner + " }")
          require(sub.select.nonEmpty,
            s"SERVICE block binds no variables: $query")
          out += ServiceBlock(endpoint, m.group(1) != null, inner, sub)
          rem.append(rest.substring(0, m.start)).append(' ')
          rest = rest.substring(after)
        case None => more = false
      }
      rem.append(rest)
      (rem.toString, out.result())
    }

    // GRAPH blocks — pulled before OPTIONAL/UNION so their braces are
    // never misread as a UNION branch; plain constant-predicate
    // patterns only (paths/variable predicates stay default-graph
    // features). Bodies that NEST a sub-SELECT extract here with
    // MATCHED braces (the [^}]-bounded graphRe below would tear them
    // short): the block's sub-SELECTs evaluate with the named graph as
    // their active graph (§13.3 composed with §12 — the planner scopes
    // them via the FROM machinery) and join the block's own patterns.
    // A VARIABLE graph term with a sub-SELECT stays rejected with
    // intent: per-graph evaluation of an aggregate needs implicit
    // g-grouping inside the sub-plan, which this engine doesn't do.
    val (bodyFullG, graphSubBlocks) = {
      val out = Seq.newBuilder[(Term, Seq[TriplePattern], Seq[BgpQuery])]
      val rem = new StringBuilder
      var rest = bodyFullV
      var more = true
      while (more) graphHeadRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          scala.util.Try(braceBlock(rest, m.end - 1)).toOption match {
            case Some((inner, after))
                if subSelectProbeRe.findFirstIn(inner).isDefined =>
              val gterm = term(m.group(1))
              require(gterm.isInstanceOf[Const],
                "sub-SELECT inside GRAPH needs a CONSTANT graph term " +
                  "(per-graph aggregate evaluation is unsupported): " +
                  query)
              val (innerNoSub, subs) = extractSubqueries(inner)
              val pats = parsePatterns(innerNoSub)
              pats.foreach(tp => require(
                tp.p.isInstanceOf[Const] || tp.p.isInstanceOf[Var],
                "GRAPH block patterns need a constant or variable " +
                  s"predicate: $tp in $query"))
              out += ((gterm, pats, subs))
              rem.append(rest.substring(0, m.start)).append(' ')
              rest = rest.substring(after)
            case Some((_, after)) =>
              // no sub-SELECT: leave the block text for graphRe below
              rem.append(rest.substring(0, after))
              rest = rest.substring(after)
            case None =>
              // unbalanced body — let the graphRe pass surface its
              // own error on the raw text
              rem.append(rest.substring(0, m.end))
              rest = rest.substring(m.end)
          }
        case None => more = false
      }
      rem.append(rest)
      (rem.toString, out.result())
    }
    val graphBlocksPlain = graphRe.findAllMatchIn(bodyFullG).map { m =>
      val gterm = term(m.group(1))
      require(gterm.isInstanceOf[Var] || gterm.isInstanceOf[Const],
        s"GRAPH term must be a variable or constant, got $gterm: $query")
      val pats = parsePatterns(m.group(2))
      require(pats.nonEmpty, s"empty GRAPH block: $query")
      // constant or variable predicate (path forms are planned over
      // slices, not the quads relation — unsupported inside GRAPH)
      pats.foreach(tp => require(
        tp.p.isInstanceOf[Const] || tp.p.isInstanceOf[Var],
        s"GRAPH block patterns need a constant or variable predicate: " +
          s"$tp in $query"))
      (gterm, pats)
    }.toSeq
    val graphBlocks = graphBlocksPlain ++
      graphSubBlocks.map(b => (b._1, b._2))
    val graphSubqueries: Seq[Seq[BgpQuery]] =
      graphBlocksPlain.map(_ => Seq.empty[BgpQuery]) ++
        graphSubBlocks.map(_._3)
    val bodyFull = graphRe.replaceAllIn(bodyFullG, "")

    val groupVars = groupByRe.findFirstMatchIn(tail).toSeq
      .flatMap(_.group(1).split("\\s+").filter(_.nonEmpty).map(_.drop(1)))
    val orderKeys = orderByRe.findFirstMatchIn(tail).toSeq.flatMap(m =>
      orderKeyRe.findAllMatchIn(m.group(1)).map { k =>
        if (k.group(3) != null) OrderKey(k.group(3), asc = true)
        else OrderKey(k.group(2), asc = k.group(1).equalsIgnoreCase("asc"))
      })
    val limitN = limitRe.findFirstMatchIn(tail).map(_.group(1).toInt)
    val offsetN = offsetRe.findFirstMatchIn(tail).map(_.group(1).toInt)
    val havingExprs = havingRe.findAllMatchIn(tail).map(m =>
      FilterExpr(m.group(1), m.group(2), m.group(3), numeric = true)).toSeq
    val tailLeft = Seq(havingRe, groupByRe, orderByRe, limitRe, offsetRe)
      .foldLeft(tail)((t, re) => re.replaceAllIn(t, " ")).trim
    require(tailLeft.isEmpty,
      s"unrecognized text after the WHERE block: '$tailLeft'")

    def parseComparison(s: String): FilterExpr = s.trim match {
      case filterExprRe(v, op, raw) =>
        term(raw.trim) match {
          case Var(w) => FilterExpr(v, op, w, numeric = false, rhsVar = true)
          case Const(c) =>
            raw.trim match {
              // datatype-driven ORDERING: a numeric-typed literal
              // compares numerically on its lexical value. Equality
              // stays canonical-form identity (id-space on the encoded
              // store), which the canonical spelling makes exact.
              case typedLitRe(lex, uri, curie)
                  if op != "=" && op != "!=" &&
                    isNumericDatatype(
                      datatypeUri(if (uri != null) uri else curie)) =>
                FilterExpr(v, op, lex, numeric = true)
              case _ => FilterExpr(v, op, c, numberRe.matches(raw.trim))
            }
          case other =>
            throw new IllegalArgumentException(
              s"FILTER right side must be a constant or variable, got $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported FILTER: $other")
    }
    // pull every FILTER clause out of one body chunk: regex filters
    // first (their nested parens are invisible to filterRe), then
    // comparison clauses in DNF (|| separates disjuncts, && separates
    // comparisons inside one)
    def extractFilters(chunk: String): (String, Seq[FilterClause]) = {
      val boundClauses = filterBoundRe.findAllMatchIn(chunk).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(2),
          if (m.group(1).isEmpty) "bound" else "!bound", "",
          numeric = false))))).toSeq
      val rest0a = filterBoundRe.replaceAllIn(chunk, "")
      val langClauses = filterLangRe.findAllMatchIn(rest0a).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(1),
          if (m.group(2) == "=") "lang" else "!lang",
          m.group(3).toLowerCase, numeric = false))))).toSeq
      val rest0b = filterLangRe.replaceAllIn(rest0a, "")
      val datatypeClauses = filterDatatypeRe.findAllMatchIn(rest0b).map { m =>
        val raw = m.group(3)
        val uri = datatypeUri(
          if (raw.startsWith("<")) raw.drop(1).dropRight(1) else raw)
        FilterClause(Seq(Seq(FilterExpr(m.group(1),
          if (m.group(2) == "=") "datatype" else "!datatype",
          uri, numeric = false))))
      }.toSeq
      val rest0c = filterDatatypeRe.replaceAllIn(rest0b, "")
      val langMatchClauses = filterLangMatchesRe.findAllMatchIn(rest0c).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(1), "langmatches",
          m.group(2).toLowerCase, numeric = false))))).toSeq
      val rest0d = filterLangMatchesRe.replaceAllIn(rest0c, "")
      val strCastClauses = filterStrCastRe.findAllMatchIn(rest0d).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(1), "lex" + m.group(2),
          m.group(3), numeric = false))))).toSeq
      val rest0 = filterStrCastRe.replaceAllIn(rest0d, "")
      val regexClauses = filterRegexRe.findAllMatchIn(rest0).map(m =>
        FilterClause(Seq(Seq(
          FilterExpr(m.group(1), "regex",
            regexWithFlags(m.group(2), m.group(3)), numeric = false))))).toSeq
      val rest1a = filterRegexRe.replaceAllIn(rest0, "")
      val strlenClauses = filterStrlenRe.findAllMatchIn(rest1a).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(1),
          "strlen" + m.group(2), m.group(3), numeric = false))))).toSeq
      val rest1 = filterStrlenRe.replaceAllIn(rest1a, "")
      val strFnClauses = filterStrFnRe.findAllMatchIn(rest1).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(2),
          m.group(1).toLowerCase, m.group(3), numeric = false))))).toSeq
      val rest2 = filterStrFnRe.replaceAllIn(rest1, "")
      val inClauses = filterInRe.findAllMatchIn(rest2).map { m =>
        val negated = m.group(2) != null
        val elems = m.group(3).split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty).map { e =>
            val op = if (negated) "!=" else "="
            if (e.startsWith("\"") && e.endsWith("\"") && e.length >= 2)
              FilterExpr(m.group(1), op, e.drop(1).dropRight(1),
                numeric = false)
            else if (numberRe.matches(e))
              FilterExpr(m.group(1), op, e, numeric = true)
            else throw new IllegalArgumentException(
              s"IN elements must be literals, got: $e")
          }
        require(elems.nonEmpty, s"empty IN list in: $chunk")
        // IN = any-equal (disjuncts); NOT IN = all-different (conjunct)
        if (negated) FilterClause(Seq(elems))
        else FilterClause(elems.map(Seq(_)))
      }.toSeq
      val rest2b = filterInRe.replaceAllIn(rest2, "")
      val isBlankClauses = filterIsBlankRe.findAllMatchIn(rest2b).map { m =>
        val fn = m.group(2).toLowerCase match {
          case "isuri" => "isiri" // §17.4.2.1: isURI is an alias
          case other   => other
        }
        FilterClause(Seq(Seq(FilterExpr(m.group(3),
          m.group(1) + fn, "", numeric = false))))
      }.toSeq
      val rest2c = filterIsBlankRe.replaceAllIn(rest2b, "")
      val sameTermClauses = filterSameTermRe.findAllMatchIn(rest2c).map(m =>
        FilterClause(Seq(Seq(FilterExpr(m.group(1), "=", m.group(2),
          numeric = false, rhsVar = true))))).toSeq
      val rest = filterSameTermRe.replaceAllIn(rest2c, "")
      val cmpClauses = filterRe.findAllMatchIn(rest).map { m =>
        FilterClause(m.group(1).split("\\|\\|").toSeq
          .map(_.split("&&").toSeq.map(parseComparison)))
      }.toSeq
      (filterRe.replaceAllIn(rest, ""),
        cmpClauses ++ regexClauses ++ strlenClauses ++ strFnClauses ++
          inClauses ++ boundClauses ++ langClauses ++ datatypeClauses ++
          langMatchClauses ++ strCastClauses ++ isBlankClauses ++
          sameTermClauses)
    }

    // pull extension clauses out first; the remainder is the
    // reference's plain dot-separated pattern list. OPTIONAL blocks go
    // first so a `{...}` following the keyword is never misread as a
    // UNION branch, with MATCHED braces so a `{ SELECT ... }` inside
    // the block is carried along. A FILTER inside an OPTIONAL block
    // scopes to that block: it restricts the block's sub-chain BEFORE
    // the left join, never the outer solution — and so does a block
    // sub-SELECT (the aggregate-as-OPTIONAL idiom: the subquery joins
    // the block's patterns first, then the whole block left-joins).
    // one braced block body → (patterns, scoped filters, sub-SELECTs):
    // nested sub-SELECTs extract at the block body's own depth 0,
    // preserving the enclosing block's join semantics
    def parseBlockBody(inner: String, kind: String)
        : (Seq[TriplePattern], Seq[FilterClause], Seq[BgpQuery]) = {
      val (innerNoSub, subs) = extractSubqueries(inner)
      val (restP, fs) = extractFilters(innerNoSub)
      val pats = parsePatterns(restP)
      require(pats.nonEmpty || subs.nonEmpty, s"empty $kind block: $query")
      (pats, fs, subs)
    }
    // keyword-headed blocks (OPTIONAL/MINUS), matched-brace: returns
    // (body with blocks removed, parsed blocks in textual order)
    def extractKeywordBlocks(body: String,
        headRe: scala.util.matching.Regex, kind: String)
        : (String, Seq[(Seq[TriplePattern], Seq[FilterClause], Seq[BgpQuery])]) = {
      val out = Seq.newBuilder[
        (Seq[TriplePattern], Seq[FilterClause], Seq[BgpQuery])]
      val rem = new StringBuilder
      var rest = body
      var more = true
      while (more) headRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          val (inner, after) = braceBlock(rest, m.end - 1)
          out += parseBlockBody(inner, kind)
          rem.append(rest.substring(0, m.start)).append(' ')
          rest = rest.substring(after)
        case None => more = false
      }
      rem.append(rest)
      (rem.toString, out.result())
    }
    val (body0ex, optionalBlocks) =
      extractKeywordBlocks(bodyFull, optionalHeadRe, "OPTIONAL")
    val optionals = optionalBlocks.map(_._1)
    val optionalFilters = optionalBlocks.map(_._2)
    val optionalSubqueries = optionalBlocks.map(_._3)
    optionalBlocks.foreach { case (pats, fs, osubs) =>
      val bound = pats.flatMap(_.vars).toSet ++
        osubs.flatMap(sq => sq.select ++ sq.aggregates.map(_.alias))
      fs.flatMap(_.disjuncts.flatten).foreach { f =>
        require(bound.contains(f.variable),
          s"OPTIONAL-scoped FILTER var ?${f.variable} must be bound inside the block: $query")
        if (f.rhsVar)
          require(bound.contains(f.value),
            s"OPTIONAL-scoped FILTER var ?${f.value} must be bound inside the block: $query")
      }
    }
    // FILTER [NOT] EXISTS blocks — pulled before VALUES/MINUS/UNION so
    // their braces are never misread downstream. Matched-brace scan
    // (the bounded regex can't see past a nested block), with
    // block-scoped sub-SELECT support: a `{ SELECT … }` inside the
    // body joins the block's patterns and the combined relation is
    // what semi/anti-joins the outer solution.
    val (body0a, existsFilters, existsSubqueries) = {
      val fs = Seq.newBuilder[(Boolean, Seq[TriplePattern])]
      val sqs = Seq.newBuilder[Seq[BgpQuery]]
      val rem = new StringBuilder
      var rest = body0ex
      var more = true
      while (more) existsHeadRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          val (inner, after) = braceBlock(rest, m.end - 1)
          val (innerNoSub, subs) = extractSubqueries(inner)
          val pats = parsePatterns(innerNoSub)
          require(pats.nonEmpty || subs.nonEmpty,
            s"empty EXISTS block: $query")
          fs += ((m.group(1) != null, pats))
          sqs += subs
          rem.append(rest.substring(0, m.start)).append(' ')
          rest = rest.substring(after)
        case None => more = false
      }
      rem.append(rest)
      (rem.toString, fs.result(), sqs.result())
    }
    // VALUES (?a ?b) { (c1 c2) ... }: inline constant TABLES — must
    // extract before the single-var form (whose regex would not match
    // the parenthesized var list but could misread the row braces)
    val valuesTables = valuesTupleRe.findAllMatchIn(body0a).map { m =>
      val vs = "\\?(\\w+)".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      val rows = "\\(([^()]*)\\)".r.findAllMatchIn(m.group(2)).map { r =>
        val consts = termTokenRe.findAllIn(r.group(1)).toSeq
          .map {
            // §10.2.2 UNDEF: that variable is unbound in this row —
            // represented as null; the planner joins each bound-mask
            // group on its bound columns only
            case u if u.equalsIgnoreCase("UNDEF") => null
            case tok => term(tok) match {
              case Const(c) => c
              case other => throw new IllegalArgumentException(
                s"VALUES entries must be constants, got $other")
            }
          }
        require(consts.size == vs.size,
          s"VALUES row arity ${consts.size} != ${vs.size} vars: $query")
        consts
      }.toSeq
      require(rows.nonEmpty, s"empty VALUES block: $query")
      (vs, rows)
    }.toSeq
    val body0av = valuesTupleRe.replaceAllIn(body0a, "")
    // VALUES ?v { c1 c2 ... }: inline constant bindings for one var.
    // A block containing UNDEF routes through the TABLE path — the
    // bound-mask grouping there implements §10.2.2 (an UNDEF row is
    // the unrestricted wildcard); pure-constant blocks keep the IN-
    // restriction fast path.
    val singleBlocks = valuesRe.findAllMatchIn(body0av).map { m =>
      val entries = termTokenRe.findAllIn(m.group(2)).toSeq
        .map {
          case u if u.equalsIgnoreCase("UNDEF") => null
          case tok => term(tok) match {
            case Const(c) => c
            case other => throw new IllegalArgumentException(
              s"VALUES entries must be constants, got $other")
          }
        }
      require(entries.nonEmpty, s"empty VALUES block: $query")
      m.group(1) -> entries
    }.toSeq
    val valuesBinds = singleBlocks.collect {
      case (v, es) if !es.contains(null) => v -> es
    }
    val undefSingles = singleBlocks.collect {
      case (v, es) if es.contains(null) =>
        (Seq(v), es.map(e => Seq(e)))
    }
    val body0b = valuesRe.replaceAllIn(body0av, "")
    val (body1, minusBlocks) =
      extractKeywordBlocks(body0b, minusHeadRe, "MINUS")
    val minuses = minusBlocks.map(_._1)
    val minusFilters = minusBlocks.map(_._2)
    val minusSubqueries = minusBlocks.map(_._3)
    // UNION chains, matched-brace (quote/IRI-aware): `{A} UNION {B}
    // [UNION {C}…]` — a branch may itself contain a sub-SELECT, whose
    // inner braces the old [^{}]-regex could not carry
    def unionAt(s: String, k: Int): Boolean =
      s.regionMatches(true, k, "union", 0, 5) &&
        (k + 5 >= s.length || !s.charAt(k + 5).isLetterOrDigit)
    def findUnionChain(s: String): Option[Int] = {
      var i = 0
      var inQ = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\\') i += 1 else if (c == '"') inQ = false }
        else if (c == '"') inQ = true
        else if (c == '<' && isIriOpen(s, i)) {
          while (i < s.length && s.charAt(i) != '>') i += 1
        } else if (c == '{') {
          val (_, after) = braceBlock(s, i)
          var k = after
          while (k < s.length && s.charAt(k).isWhitespace) k += 1
          if (unionAt(s, k)) return Some(i)
          i = after - 1
        }
        i += 1
      }
      None
    }
    val (bodyStripped, unionBlocks) = {
      val out = Seq.newBuilder[
        Seq[(Seq[TriplePattern], Seq[FilterClause], Seq[BgpQuery])]]
      val rem = new StringBuilder
      var rest = body1
      var more = true
      while (more) findUnionChain(rest) match {
        case Some(start) =>
          val branches = Seq.newBuilder[
            (Seq[TriplePattern], Seq[FilterClause], Seq[BgpQuery])]
          var pos = start
          var end = start
          var cont = true
          while (cont) {
            val (inner, after) = braceBlock(rest, pos)
            branches += parseBlockBody(inner, "UNION")
            var k = after
            while (k < rest.length && rest.charAt(k).isWhitespace) k += 1
            if (unionAt(rest, k)) {
              var j = k + 5
              while (j < rest.length && rest.charAt(j).isWhitespace) j += 1
              require(j < rest.length && rest.charAt(j) == '{',
                s"UNION must be followed by a braced branch: $query")
              pos = j
            } else { end = after; cont = false }
          }
          out += branches.result()
          rem.append(rest.substring(0, start)).append(' ')
          rest = rest.substring(end)
        case None => more = false
      }
      rem.append(rest)
      (rem.toString, out.result())
    }
    val unions = unionBlocks.map(_.map(_._1))
    val unionFilters = unionBlocks.map(_.map(_._2))
    val unionSubqueries = unionBlocks.map(_.map(_._3))
    unionBlocks.foreach { branches =>
      // sequence-path intermediates and blank nodes are branch-local,
      // not part of the branch's visible binding set (§4.1.4: a blank
      // node label cannot span basic graph patterns); a branch
      // sub-SELECT contributes its projection
      val varSets = branches.map { case (pats, _, subs) =>
        (pats.flatMap(_.vars) ++
          subs.flatMap(sq => sq.select ++ sq.aggregates.map(_.alias)))
          .filterNot(v =>
            v.startsWith(SeqVarPrefix) || v.startsWith(BNodeVarPrefix)).toSet
      }
      require(varSets.distinct.size == 1,
        s"UNION branches must bind the same variables, got: $varSets")
      // a var bound as an AGGREGATE in one branch and as a store term
      // in another would union computed values with ids/lexicals —
      // reject loudly rather than let the edge decode mis-type it
      val aggVars = branches.flatMap(_._3)
        .flatMap(_.aggregates.map(_.alias)).toSet
      val patVars = branches.flatMap(_._1).flatMap(_.vars).toSet
      require((aggVars intersect patVars).isEmpty,
        s"UNION branch sub-SELECT aggregate alias(es) " +
          s"${(aggVars intersect patVars).map("?" + _).mkString(", ")} " +
          s"also bind as pattern variables in the group: $query")
    }
    // scoped-filter vars must be bound inside their own block/branch
    // (same contract as OPTIONAL-scoped filters)
    (minusBlocks ++ unionBlocks.flatten).foreach { case (pats, fs, subs) =>
      val bound = pats.flatMap(_.vars).toSet ++
        subs.flatMap(sq => sq.select ++ sq.aggregates.map(_.alias))
      fs.flatMap(_.disjuncts.flatten).foreach { f =>
        require(bound.contains(f.variable),
          s"block-scoped FILTER var ?${f.variable} must be bound inside the block: $query")
        if (f.rhsVar)
          require(bound.contains(f.value),
            s"block-scoped FILTER var ?${f.value} must be bound inside the block: $query")
      }
    }
    // a sub-SELECT still in the body sits inside a block without
    // sub-SELECT support — reject with intent, not a mis-parse
    require(subSelectProbeRe.findFirstIn(bodyStripped).isEmpty,
      s"sub-SELECT nested inside an unsupported enclosing block " +
        s"(EXISTS or VALUES) is not supported here: $query")
    // top-level FILTERs, matched against the block-STRIPPED body only
    // (OPTIONAL/MINUS/UNION-scoped clauses are extracted with their
    // blocks above and never hoisted here)
    // BIND clauses, in textual order (later BINDs see earlier aliases)
    val binds = bindRe.findAllMatchIn(bodyStripped).map(m =>
      Bind(m.group(2), parseBindExpr(m.group(1)))).toSeq
    val bodyNoBinds = bindRe.replaceAllIn(bodyStripped, " ")
    val (body, filters) = {
      val (b, fs) = extractFilters(bodyNoBinds)
      (b.trim, fs)
    }

    val patterns = parsePatterns(body)
    require(patterns.nonEmpty || unions.nonEmpty || subqueries.nonEmpty ||
        graphBlocks.nonEmpty || services.nonEmpty,
      s"empty BGP: $query")
    // SERVICE bodies validated themselves during their sub-parse
    val allPatterns =
      patterns ++ optionals.flatten ++ unions.flatten.flatten ++
        minuses.flatten ++ existsFilters.flatMap(_._2) ++
        graphBlocks.flatMap(_._2)
    allPatterns.foreach { p =>
      Seq(p.s, p.o).foreach(t =>
        require(t.isInstanceOf[Var] || t.isInstanceOf[Const],
          s"property paths are only valid at the predicate position: $p"))
    }

    // the UNION-branch aggregate-alias guard, generalized: an
    // aggregate alias computed by ANY sub-SELECT (top-level, OPTIONAL-,
    // MINUS-, or UNION-scoped) that also binds as a store term in a
    // pattern would join encoded ids against computed aggregate
    // values — and the shared column's lexical marking makes the
    // result edge skip the id decode, emitting raw hashes. Reject
    // loudly instead of producing silently wrong rows.
    val subAggAliases =
      (subqueries ++ optionalSubqueries.flatten ++ minusSubqueries.flatten ++
        unionSubqueries.flatten.flatten ++ existsSubqueries.flatten ++
        graphSubqueries.flatten)
        .flatMap(_.aggregates.map(_.alias)).toSet
    val storeBoundVars = allPatterns.flatMap(_.vars).toSet ++
      services.flatMap(_.query.select)
    require((subAggAliases intersect storeBoundVars).isEmpty,
      s"sub-SELECT aggregate alias(es) " +
        s"${(subAggAliases intersect storeBoundVars).map("?" + _).mkString(", ")} " +
        s"also bind as pattern variables: $query")

    // MINUS blocks restrict, never bind: SELECT/FILTER vars must come
    // from the positive patterns (or a VALUES block, which DOES bind)
    val known =
      (patterns ++ optionals.flatten ++ unions.flatten.flatten)
        .flatMap(_.vars).toSet ++ valuesBinds.map(_._1) ++
        valuesTables.flatMap(_._1) ++ undefSingles.flatMap(_._1) ++
        // a subquery exports exactly its projection (group keys and
        // aggregate aliases included) to the outer scope — OPTIONAL-
        // scoped subqueries export too (their vars may be null-padded),
        // and UNION-branch subqueries export like branch pattern vars.
        // MINUS-scoped subqueries restrict, never bind (§8.3).
        (subqueries ++ optionalSubqueries.flatten ++
          unionSubqueries.flatten.flatten)
          .flatMap(sq => sq.select ++ sq.aggregates.map(_.alias)) ++
        // GRAPH blocks bind their pattern vars and (var form) the
        // graph; a GRAPH-scoped sub-SELECT exports its projection
        graphBlocks.flatMap { case (g, pats) =>
          pats.flatMap(_.vars) ++
            (g match { case Var(n) => Seq(n); case _ => Nil })
        } ++
        graphSubqueries.flatten
          .flatMap(sq => sq.select ++ sq.aggregates.map(_.alias)) ++
        // SERVICE blocks bind their pattern vars (§2.2 join semantics)
        services.flatMap(_.query.select)
    // BIND aliases must be fresh and their refs bound before use
    // (sequence scoping: an earlier alias is visible to a later BIND)
    binds.foldLeft(known) { (scope, b) =>
      require(!scope.contains(b.alias),
        s"BIND alias ?${b.alias} is already bound: $query")
      b.refs.foreach(v => require(scope.contains(v),
        s"BIND var ?$v not bound before use: $query"))
      scope + b.alias
    }
    val knownAll = known ++ binds.map(_.alias)
    val selectVars =
      if (selectStar) {
        // SELECT * projects user variables (BIND aliases included) —
        // sequence-path intermediates and pattern blank nodes are
        // existential (§18.2.2.3, §4.1.4)
        val visible = knownAll.filterNot(v =>
          v.startsWith(SeqVarPrefix) || v.startsWith(BNodeVarPrefix))
        require(visible.nonEmpty, s"SELECT * needs at least one variable: $query")
        visible.toSeq.sorted
      } else selectVars0
    selectVars.foreach(v =>
      require(knownAll.contains(v), s"SELECT var ?$v not bound in any pattern"))
    filters.flatMap(_.disjuncts.flatten).foreach { f =>
      require(knownAll.contains(f.variable), s"FILTER var ?${f.variable} not bound")
      if (f.rhsVar)
        require(knownAll.contains(f.value), s"FILTER var ?${f.value} not bound")
    }

    // aggregate/modifier validation (SPARQL 1.1 §18.2.4-18.2.5 shape:
    // with aggregates every plain SELECT var must be a group key; ORDER
    // BY may reference solution vars, group keys, or agg aliases)
    val aliases = aggregates.map(_.alias)
    havingExprs.foreach(h =>
      require(aliases.contains(h.variable),
        s"HAVING var ?${h.variable} must be an aggregate alias: $query"))
    require(aliases.distinct.size == aliases.size,
      s"duplicate aggregate alias: $query")
    groupVars.foreach(v =>
      require(knownAll.contains(v), s"GROUP BY var ?$v not bound"))
    aggregates.flatMap(_.variable).foreach(v =>
      require(knownAll.contains(v), s"aggregate var ?$v not bound"))
    if (aggregates.nonEmpty)
      selectVars.foreach(v =>
        require(groupVars.contains(v),
          s"SELECT var ?$v must be a GROUP BY key when aggregating"))
    else
      require(groupVars.isEmpty, s"GROUP BY requires an aggregate: $query")
    val outVars =
      if (aggregates.nonEmpty) (selectVars ++ groupVars ++ aliases).toSet
      else if (isDistinct) selectVars.toSet
      else knownAll
    orderKeys.foreach(k =>
      require(outVars.contains(k.variable),
        s"ORDER BY var ?${k.variable} not available after projection"))

    BgpQuery(selectVars, patterns, optionals, filters, isDistinct, unions,
      minuses, valuesBinds, aggregates, groupVars, orderKeys, limitN, offsetN,
      optionalFilters, existsFilters, havingExprs, minusFilters, unionFilters,
      binds, subqueries, valuesTables ++ undefSingles, graphBlocks, services,
      fromGraphs, fromNamed, optionalSubqueries, unionSubqueries,
      minusSubqueries, existsSubqueries, graphSubqueries)
  }

  /** Matched-brace extraction shared by the SERVICE scanner and the
    * update parser: `from` indexes the opening `{`; returns (inner
    * body, index just past the closing `}`). Quote (with backslash
    * escapes) and `<...>` IRI aware.
    */
  /** Does the `<` at index `i` open an IRI (`<http://…>`) rather than
    * begin a less-than comparison (`FILTER (?x < ?y)`)? IRIs cannot
    * contain whitespace, quotes, or braces, so the `<` is an IRI opener
    * iff a `>` appears before any of those (or end of input). Shared by
    * every brace/sep scanner — without it a supported `<` comparison
    * inside a SERVICE body or update text would latch the scanner into
    * IRI mode and blind it to real braces.
    */
  private[bgp] def isIriOpen(s: String, i: Int): Boolean = {
    var k = i + 1
    while (k < s.length) {
      val c = s.charAt(k)
      if (c == '>') return k > i + 1
      if (c.isWhitespace || c == '"' || c == '{' || c == '}' || c == '<')
        return false
      k += 1
    }
    false
  }

  private[bgp] def braceBlock(s: String, from: Int): (String, Int) = {
    require(from < s.length && s.charAt(from) == '{',
      s"expected '{' at $from in '${s.take(80)}'")
    var depth = 0
    var inQuote = false
    var inAngle = false
    var i = from
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQuote) {
        if (ch == '\\') i += 1
        else if (ch == '"') inQuote = false
      } else ch match {
        case '"' => inQuote = true
        case '<' if isIriOpen(s, i) => inAngle = true
        case '>' => inAngle = false
        case '{' if !inAngle => depth += 1
        case '}' if !inAngle =>
          depth -= 1
          if (depth == 0) return (s.substring(from + 1, i), i + 1)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced braces: '${s.drop(from).take(80)}'")
  }

  /** Scan for `{ SELECT ... }` blocks with balanced-brace matching;
    * returns the body with the blocks blanked out plus the recursively
    * parsed subqueries.
    */
  private def extractSubqueries(body: String): (String, Seq[BgpQuery]) = {
    val sb = new StringBuilder
    val subs = scala.collection.mutable.Buffer.empty[BgpQuery]
    var i = 0
    // depth of NON-subquery braces (OPTIONAL/MINUS/UNION blocks, still
    // unextracted at this stage of the parse). The depth counter and
    // the sub-SELECT skip both share braceBlock's quote/IRI awareness:
    // a '{' or '}' inside a string literal (or an IRI) must not
    // misbalance blockDepth, or a block-nested sub-SELECT would look
    // top-level and get hoisted — silently turning an OPTIONAL left
    // join into an inner join, the exact hazard the leave-in-place
    // rule prevents.
    var blockDepth = 0
    var inQuote = false
    var inAngle = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuote) {
        if (c == '\\' && i + 1 < body.length) {
          sb.append(c).append(body.charAt(i + 1))
          i += 2
        } else {
          if (c == '"') inQuote = false
          sb.append(c)
          i += 1
        }
      } else if (inAngle) {
        if (c == '>') inAngle = false
        sb.append(c)
        i += 1
      } else {
        val isSub = c == '{' && {
          var k = i + 1
          while (k < body.length && body.charAt(k).isWhitespace) k += 1
          body.regionMatches(true, k, "select", 0, "select".length)
        }
        if (isSub) {
          // braceBlock is the shared quote/IRI-aware matched-brace
          // scanner — literal braces inside the sub-SELECT can't tear
          // the copy/extraction short
          val (inner, j) = braceBlock(body, i)
          // a sub-SELECT inside a block has block-scoped semantics
          // (e.g. OPTIONAL's left join) — hoisting it here would
          // silently change the join shape, so leave it IN PLACE,
          // verbatim, for the block's own extractor (which re-runs
          // this function on the block body at depth 0; blocks
          // without sub-SELECT support reject loudly downstream)
          if (blockDepth > 0) sb.append(body.substring(i, j))
          else {
            subs += parse(inner)
            sb.append(' ')
          }
          i = j
        } else {
          c match {
            case '"' => inQuote = true
            case '<' if isIriOpen(body, i) => inAngle = true
            case '{' => blockDepth += 1
            case '}' => blockDepth -= 1
            case _ => ()
          }
          sb.append(c)
          i += 1
        }
      }
    }
    (sb.toString, subs.toSeq)
  }

  /** Parse one BIND body: CONCAT(...), STRLEN(?v), binary arithmetic,
    * or a bare variable / literal.
    */
  private def parseBindExpr(raw: String): BindExpr = {
    val s = raw.trim
    val low = s.toLowerCase
    def operand(t: String): BindExpr =
      if (t.startsWith("?")) BVar(t.drop(1))
      else BLit(t, numberRe.matches(t))
    def argList(fn: String): Seq[BindExpr] = {
      val inner = s.substring(s.indexOf('(') + 1, s.length - 1)
      val args = inner.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { a =>
        if (a.startsWith("?")) BVar(a.drop(1)): BindExpr
        else if (a.startsWith("\"") && a.endsWith("\"") && a.length >= 2)
          BLit(a.drop(1).dropRight(1), numeric = false)
        else throw new IllegalArgumentException(
          s"$fn args must be variables or string literals, got: $a")
      }
      require(args.nonEmpty, s"empty $fn: $raw")
      args
    }
    // split a call's argument list on commas OUTSIDE string literals
    def splitArgs(inner: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer(new StringBuilder)
      var inQ = false
      for (c <- inner) {
        if (c == '"') { inQ = !inQ; out.last.append(c) }
        else if (c == ',' && !inQ) out += new StringBuilder
        else out.last.append(c)
      }
      out.map(_.toString.trim).filter(_.nonEmpty).toSeq
    }
    def inner0 = s.substring(s.indexOf('(') + 1, s.length - 1)
    def strLit(t: String): String = {
      require(t.startsWith("\"") && t.endsWith("\"") && t.length >= 2,
        s"expected a string literal, got: $t")
      t.drop(1).dropRight(1)
    }
    if (low.startsWith("concat(") && s.endsWith(")"))
      BConcat(argList("CONCAT"))
    else if (low.startsWith("coalesce(") && s.endsWith(")"))
      BCoalesce(argList("COALESCE"))
    else if (low.startsWith("ucase(") && s.endsWith(")"))
      BFunc1("ucase", parseBindExpr(inner0))
    else if (low.startsWith("lcase(") && s.endsWith(")"))
      BFunc1("lcase", parseBindExpr(inner0))
    else if (low.startsWith("abs(") && s.endsWith(")"))
      BFunc1("abs", parseBindExpr(inner0))
    else if (low.startsWith("ceil(") && s.endsWith(")"))
      BFunc1("ceil", parseBindExpr(inner0))
    else if (low.startsWith("floor(") && s.endsWith(")"))
      BFunc1("floor", parseBindExpr(inner0))
    else if (low.startsWith("round(") && s.endsWith(")"))
      BFunc1("round", parseBindExpr(inner0))
    else if (low.startsWith("md5(") && s.endsWith(")"))
      BFunc1("md5", parseBindExpr(inner0))
    else if (low.startsWith("sha256(") && s.endsWith(")"))
      BFunc1("sha256", parseBindExpr(inner0))
    else if (low.startsWith("encode_for_uri(") && s.endsWith(")"))
      BFunc1("encode_for_uri", parseBindExpr(inner0))
    else if (Seq("year(", "month(", "day(", "hours(", "minutes(",
        "seconds(", "tz(").exists(low.startsWith) && s.endsWith(")"))
      BFunc1(low.substring(0, low.indexOf('(')), parseBindExpr(inner0))
    else if (low.startsWith("str(") && s.endsWith(")"))
      BFunc1("str", parseBindExpr(inner0))
    else if (low.startsWith("strlang(") && s.endsWith(")")) {
      val as = splitArgs(inner0)
      require(as.size == 2, s"STRLANG takes 2 args: $raw")
      BStr2("strlang", parseBindExpr(as.head), strLit(as(1)))
    } else if (low.startsWith("strdt(") && s.endsWith(")")) {
      val as = splitArgs(inner0)
      require(as.size == 2, s"STRDT takes 2 args: $raw")
      val dt0 = as(1).trim
      BStr2("strdt", parseBindExpr(as.head),
        if (dt0.startsWith("<") && dt0.endsWith(">"))
          dt0.substring(1, dt0.length - 1)
        else dt0)
    }
    else if (low.startsWith("substr(") && s.endsWith(")")) {
      val as = splitArgs(inner0)
      require(as.size == 2 || as.size == 3, s"SUBSTR takes 2-3 args: $raw")
      BSubstr(parseBindExpr(as.head), as(1).toInt,
        if (as.size == 3) Some(as(2).toInt) else None)
    } else if (low.startsWith("replace(") && s.endsWith(")")) {
      val as = splitArgs(inner0)
      require(as.size == 3, s"REPLACE takes 3 args: $raw")
      BReplace(parseBindExpr(as.head), strLit(as(1)), strLit(as(2)))
    } else if ((low.startsWith("strbefore(") || low.startsWith("strafter("))
        && s.endsWith(")")) {
      val fn = if (low.startsWith("strbefore(")) "strbefore" else "strafter"
      val as = splitArgs(inner0)
      require(as.size == 2, s"${fn.toUpperCase} takes 2 args: $raw")
      BStr2(fn, parseBindExpr(as.head), strLit(as(1)))
    } else if (low.startsWith("if(") && s.endsWith(")")) {
      val as = splitArgs(inner0)
      require(as.size == 3, s"IF takes 3 args: $raw")
      val condRe = "^(\\S+)\\s*(>=|<=|!=|=|>|<)\\s*(.+)$".r
      as.head match {
        case condRe(l, op, r) =>
          BIf(parseBindExpr(l), op, parseBindExpr(r),
            parseBindExpr(as(1)), parseBindExpr(as(2)))
        case other => throw new IllegalArgumentException(
          s"IF condition must be one comparison: $other")
      }
    } else if (low.startsWith("strlen(") && s.endsWith(")")) {
      val inner = s.substring(s.indexOf('(') + 1, s.length - 1).trim
      require(inner.startsWith("?"), s"STRLEN takes a variable: $raw")
      BStrlen(BVar(inner.drop(1)))
    } else s match {
      case bindArithRe(l, op, r) => BArith(op, operand(l), operand(r))
      case t if t.startsWith("?") => BVar(t.drop(1))
      case t if t.startsWith("\"") && t.endsWith("\"") && t.length >= 2 =>
        BLit(t.drop(1).dropRight(1), numeric = false)
      case t if numberRe.matches(t) => BLit(t, numeric = true)
      case other =>
        throw new IllegalArgumentException(s"unsupported BIND expression: $other")
    }
  }

  private val askRe = "(?is)^\\s*ask\\s*(where.*)$".r
  private val constructRe = "(?is)^\\s*construct\\s*\\{(.*?)\\}\\s*(where.*)$".r

  /** `ASK WHERE { ... }` — rewritten to a `SELECT *` over the same
    * body (so the full grammar applies); the planner reduces it to one
    * boolean row.
    */
  def parseAsk(query: String): BgpQuery = expandPrefixes(query) match {
    case askRe(rest) => parse(s"select * $rest")
    case _ => throw new IllegalArgumentException(s"not an ASK query: $query")
  }

  private val describeVarRe =
    "(?is)^\\s*describe((?:\\s+\\?\\w+)+)\\s*(where.*)$".r
  private val describeConstRe = "(?is)^\\s*describe\\s+(\\S+)\\s*$".r

  /** `DESCRIBE ?v [?w …] WHERE { ... }` (resources bound by the
    * pattern) or `DESCRIBE <node>` (one directly named resource) —
    * SPARQL 1.1 §16.4, with the common "all triples incident to the
    * resource" description (the spec leaves the shape to the
    * implementation). Returns the described constant, or the vars plus
    * the underlying SELECT that binds them.
    */
  def parseDescribe(query: String)
      : Either[String, (Seq[String], BgpQuery)] =
    expandPrefixes(query) match {
      case describeVarRe(vs, rest) =>
        val vars = "\\?(\\w+)".r.findAllMatchIn(vs).map(_.group(1)).toSeq
        Right((vars,
          parse(s"select ${vars.map("?" + _).mkString(" ")} $rest")))
      case describeConstRe(tok) => term(tok) match {
        case Const(c) => Left(c)
        case other => throw new IllegalArgumentException(
          s"DESCRIBE takes ?vars + WHERE or one constant, got $other: $query")
      }
      case _ =>
        throw new IllegalArgumentException(s"not a DESCRIBE query: $query")
    }

  // `CONSTRUCT WHERE { ... }` shorthand (SPARQL 1.1 §10.2.3): the
  // template IS the pattern. The spec restricts the body to plain
  // triple patterns; anything else fails template validation below.
  private val constructWhereRe =
    "(?is)^\\s*construct\\s+where\\s*\\{(.*)\\}\\s*$".r

  /** `CONSTRUCT { template } WHERE { ... }` — returns the template
    * triples plus the underlying SELECT over the template's variables.
    */
  def parseConstruct(query: String): (Seq[TriplePattern], BgpQuery) =
    expandPrefixes(query) match {
      case constructWhereRe(body) =>
        parseConstruct(s"construct { $body } where { $body }")
      case constructRe(template, rest) =>
        val templates =
          parsePatterns(template, new java.util.concurrent.atomic.AtomicInteger)
        require(!templates.flatMap(_.vars).exists(_.startsWith(SeqVarPrefix)),
          s"sequence paths are not allowed in CONSTRUCT templates: $query")
        templates.foreach(t => Seq(t.s, t.p, t.o).foreach(term =>
          require(term.isInstanceOf[Var] || term.isInstanceOf[Const],
            s"CONSTRUCT templates allow only vars and constants: $t")))
        val vars = templates.flatMap(_.vars).distinct
        require(vars.nonEmpty, "CONSTRUCT template needs at least one variable")
        (templates, parse(s"select ${vars.map("?" + _).mkString(" ")} $rest"))
      case _ => throw new IllegalArgumentException(s"not a CONSTRUCT query: $query")
    }

  /** Dot-separated triple patterns; a '.' only separates when it
    * stands alone (URIs and literals may contain dots). Sequence paths
    * desugar here into chained patterns over fresh `_sqN` intermediate
    * variables — `fresh` is query-global so intermediates from
    * different blocks never collide (or accidentally join).
    */
  private def parsePatterns(body: String,
      fresh: java.util.concurrent.atomic.AtomicInteger): Seq[TriplePattern] =
    body.split("\\s+\\.\\s+|\\s+\\.$|^\\.\\s+").toSeq
      .map(_.trim).filter(s => s.nonEmpty && s != ".")
      .flatMap { pat =>
        val toks = termTokenRe.findAllIn(pat).toSeq
        require(toks.length == 3, s"triple pattern needs 3 terms, got '${pat}'")
        val (s, p, o) = (term(toks(0)), term(toks(1)), term(toks(2)))
        p match {
          case PathSeq(steps) =>
            // ?s p1/p2 ?o  ⇒  ?s p1 ?m . ?m p2 ?o  (SPARQL 1.1
            // §18.2.2.3 Join translation; intermediates stay in the
            // solution frame for multiplicity but are never projected)
            val mids = steps.init.map(_ =>
              Var(s"$SeqVarPrefix${fresh.getAndIncrement()}"))
            val froms = s +: mids
            val tos = mids :+ o
            froms.lazyZip(steps).lazyZip(tos).map(TriplePattern(_, _, _)).toSeq
          case _ => Seq(TriplePattern(s, p, o))
        }
      }

  private val repeatRe = "^(.+)\\{(\\d+)(?:,(\\d+))?\\}$".r
  private val groupRepeatRe = "^\\(([^()]+)\\)([+*])$".r

  /** Lower a flat path Term to the recursive tree — the bridge the
    * nested fallbacks use when a sub-expression parsed into one of the
    * specialized flat forms.
    */
  private def toPExpr(t: Term): PExpr = t match {
    case Const(p) => PExpr.Link(p)
    case PathPlus(p) => PExpr.Plus(PExpr.Link(p))
    case PathStar(p) => PExpr.Star(PExpr.Link(p))
    case PathOpt(p) => PExpr.ZeroOne(PExpr.Link(p))
    case PathInverse(p) => PExpr.Inv(PExpr.Link(p))
    case PathAlt(ps) => PExpr.Alt(ps.map(PExpr.Link))
    case PathRepeat(p, lo, hi) => PExpr.Repeat(PExpr.Link(p), lo, hi)
    case PathNeg(f, i) => PExpr.NegSet(f, i)
    case PathGroupRepeat(ps, star) =>
      val s = PExpr.PSeq(ps.map(PExpr.Link))
      if (star) PExpr.Star(s) else PExpr.Plus(s)
    case PathSeq(steps) => PExpr.PSeq(steps.map(toPExpr))
    case PathTree(e) => e
    case other => throw new IllegalArgumentException(
      s"not a property path: $other")
  }

  /** Split on `sep` at paren depth 0, skipping `<...>` IRI spans —
    * the nested-path splitter (alternation / sequence precedence).
    */
  private def depth0Split(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var d = 0
    var inIri = false
    s.foreach { c =>
      c match {
        case '<' if !inIri => inIri = true; cur += c
        case '>' if inIri => inIri = false; cur += c
        case '(' if !inIri => d += 1; cur += c
        case ')' if !inIri => d -= 1; cur += c
        case `sep` if d == 0 && !inIri => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    out += cur.toString
    out.result()
  }

  /** Recursive-descent parse of one FULL path expression (SPARQL 1.1
    * §9.1 composition, grammar precedence: `|` < `/` < `^`-prefix <
    * postfix modifier < primary). Leaves resolve through [[term]], so
    * IRIs / CURIEs / negated sets spell exactly as elsewhere.
    */
  private[bgp] def pathExprOf(tok0: String): PExpr = {
    val tok = tok0.trim
    require(tok.nonEmpty, "empty path expression")
    val alts = depth0Split(tok, '|')
    if (alts.length > 1) return PExpr.Alt(alts.map(pathExprOf))
    val seqs = depth0Split(tok, '/')
    if (seqs.length > 1) return PExpr.PSeq(seqs.map(pathExprOf))
    if (tok.startsWith("^") && tok.length > 1)
      return PExpr.Inv(pathExprOf(tok.drop(1)))
    if (!tok.startsWith("<") && repeatRe.matches(tok)) tok match {
      case repeatRe(inner, loS, hiS) =>
        val lo = loS.toInt
        val hi = if (hiS == null) lo else hiS.toInt
        require(lo <= hi, s"path repeat needs lo <= hi: $tok")
        require(hi <= 8, s"path repeat bound is capped at 8 hops: $tok")
        return PExpr.Repeat(pathExprOf(inner), lo, hi)
    }
    if (tok.length > 1 && !tok.startsWith("<")) {
      if (tok.endsWith("+")) return PExpr.Plus(pathExprOf(tok.dropRight(1)))
      if (tok.endsWith("*")) return PExpr.Star(pathExprOf(tok.dropRight(1)))
      if (tok.endsWith("?")) return PExpr.ZeroOne(pathExprOf(tok.dropRight(1)))
    }
    if (tok.length > 2 && tok.startsWith("(") && tok.endsWith(")") &&
        parenCloseOf(tok, 0) == tok.length - 1)
      return pathExprOf(tok.substring(1, tok.length - 1))
    toPExpr(term(tok))
  }

  private def term(tok: String): Term =
    if (tok.startsWith("?")) Var(tok.drop(1))
    // blank node in a pattern = a non-selectable query-scoped variable
    else if (tok.startsWith("_:") && tok.length > 2)
      Var(BNodeVarPrefix + tok.drop(2))
    // typed literal "lex"^^<uri> / "lex"^^pfx:local → canonical form
    else if (typedLitRe.matches(tok)) tok match {
      case typedLitRe(lex, uri, curie) =>
        Const(canonTyped(lex, if (uri != null) uri else curie))
    }
    // language-tagged literal "lex"@tag → canonical lowercase tag
    else if (langLitRe.matches(tok)) tok match {
      case langLitRe(lex, lang) => Const(canonLang(lex, lang))
    }
    // negated property set: !p, !^p, or !(p1|^p2|…) — bare predicates,
    // each optionally inverse-marked (§9.1 full grammar)
    else if (tok.startsWith("!") && tok.length > 1) {
      val inner0 = tok.drop(1)
      val inner =
        if (inner0.startsWith("(") && inner0.endsWith(")"))
          inner0.drop(1).dropRight(1)
        else inner0
      def asPred(t: String): String = term(t) match {
        case Const(p) => p
        case other => throw new IllegalArgumentException(
          s"negated property sets list plain predicates, got $other in $tok")
      }
      val members = inner.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      val (invToks, fwdToks) = members.partition(_.startsWith("^"))
      PathNeg(fwdToks.map(asPred), invToks.map(t => asPred(t.drop(1))))
    }
    // a fully parenthesized path group with no modifier is the path
    // itself: (a/b) ≡ a/b, (a|b) ≡ a|b
    else if (tok.length > 2 && tok.startsWith("(") && tok.endsWith(")") &&
        parenCloseOf(tok, 0) == tok.length - 1)
      term(tok.substring(1, tok.length - 1).trim)
    // grouped sequence under repetition (p1/p2)+ / (p1/p2)* — matched
    // BEFORE the plain sequence branch, whose '/'-split would tear the
    // parenthesized group apart
    else if (groupRepeatRe.matches(tok)) tok match {
      case groupRepeatRe(inner, mod) =>
        val steps = inner.split("/").toSeq.map(_.trim)
        require(steps.nonEmpty && steps.forall(_.nonEmpty),
          s"empty grouped-path step: $tok")
        val stepTerms = steps.map(term)
        if (stepTerms.forall(_.isInstanceOf[Const]))
          PathGroupRepeat(stepTerms.collect { case Const(p) => p },
            star = mod == "*")
        else {
          // non-plain steps — (a|b)+, (a+/c)* — take the general tree
          val seq =
            if (stepTerms.length == 1) toPExpr(stepTerms.head)
            else PExpr.PSeq(stepTerms.map(toPExpr))
          PathTree(if (mod == "*") PExpr.Star(seq) else PExpr.Plus(seq))
        }
    }
    // TOP-LEVEL alternation outranks sequence (SPARQL 1.1 §9.1
    // precedence: `|` binds loosest): a|b/c ≡ a|(b/c). Checked before
    // the '/'-split so unparenthesized mixes parse per spec. Bare
    // tokens only; split is paren- and IRI-aware.
    else if (depth0Split(tok, '|').length > 1 &&
        depth0SlashSplit(tok).length > 1 && !tok.startsWith("<") &&
        !tok.startsWith("\"") && tok.length > 1)
      PathTree(PExpr.Alt(depth0Split(tok, '|').map(b => pathExprOf(b))))
    // sequence path p1/p2/...: bare-token paths only (URIs and quoted
    // literals containing '/' stay constants); each step may be any
    // single-predicate path form (a+, ^a, a?, ...), a parenthesized
    // group — an alternation step `(a|b)/c` or a nested sequence
    // `(a/b)/c`, which flattens — or a grouped repetition `(a/b)+`.
    // The split respects parens, so group members never tear.
    else if (depth0SlashSplit(tok).length > 1 && !tok.startsWith("<")
        && !tok.startsWith("\"") && tok.length > 1) {
      val steps = depth0SlashSplit(tok).map(_.trim)
      require(steps.forall(_.nonEmpty), s"empty sequence-path step: $tok")
      def stripParens(st: String): String =
        if (st.length > 2 && st.startsWith("(") && st.endsWith(")") &&
            parenCloseOf(st, 0) == st.length - 1)
          st.substring(1, st.length - 1).trim
        else st
      PathSeq(steps.map(st => term(stripParens(st))).flatMap {
        case PathSeq(inner) => inner // nested sequence group flattens
        case s @ (Const(_) | PathPlus(_) | PathStar(_) | PathOpt(_) |
                  PathInverse(_) | PathAlt(_) | PathRepeat(_, _, _) |
                  PathGroupRepeat(_, _) | PathTree(_)) => Seq(s)
        case other => throw new IllegalArgumentException(
          s"sequence-path steps must be predicate paths, got $other in $tok")
      })
    }
    else if (repeatRe.matches(tok)) tok match {
      case repeatRe(inner, loS, hiS) =>
        val lo = loS.toInt
        val hi = if (hiS == null) lo else hiS.toInt
        require(lo <= hi, s"path repeat needs lo <= hi: $tok")
        require(hi <= 8, s"path repeat bound is capped at 8 hops: $tok")
        term(inner) match {
          case Const(p) => PathRepeat(p, lo, hi)
          // counted repetition over a composite — (a|b){2,3} — nests
          case other => PathTree(PExpr.Repeat(toPExpr(other), lo, hi))
        }
    }
    else if (tok.endsWith("+") && tok.length > 1) term(tok.dropRight(1)) match {
      case Const(p) => PathPlus(p)
      case other => PathTree(PExpr.Plus(toPExpr(other)))
    }
    else if (tok.endsWith("*") && tok.length > 1) term(tok.dropRight(1)) match {
      case Const(p) => PathStar(p)
      case other => PathTree(PExpr.Star(toPExpr(other)))
    }
    else if (tok.endsWith("?") && tok.length > 1) term(tok.dropRight(1)) match {
      case Const(p) => PathOpt(p)
      case other => PathTree(PExpr.ZeroOne(toPExpr(other)))
    }
    else if (tok.startsWith("^") && tok.length > 1) term(tok.drop(1)) match {
      case Const(p) => PathInverse(p)
      // inverse of a composite — ^(p1|p2), ^(a/b), ^a+ — nests
      case other => PathTree(PExpr.Inv(toPExpr(other)))
    }
    // alternation applies to bare-token paths only: a URI or quoted
    // literal containing '|' stays a constant. The split is paren- and
    // IRI-aware so group branches never tear: (a/b)|c
    else if (depth0Split(tok, '|').length > 1 && !tok.startsWith("<") &&
        !tok.startsWith("\"") && tok.length > 1) {
      val branches = depth0Split(tok, '|').map(_.trim).map { b =>
        if (b.length > 2 && b.startsWith("(") && b.endsWith(")") &&
            parenCloseOf(b, 0) == b.length - 1)
          term(b.substring(1, b.length - 1).trim)
        else term(b)
      }
      if (branches.forall(_.isInstanceOf[Const]))
        PathAlt(branches.collect { case Const(p) => p })
      else
        // alternation over composites — a+|b, (a/b)|c — nests
        PathTree(PExpr.Alt(branches.map(toPExpr)))
    }
    else if (tok.startsWith("<") && tok.endsWith(">")) Const(tok.drop(1).dropRight(1))
    else if (tok.startsWith("\"") && tok.endsWith("\"") && tok.length >= 2)
      Const(unescapeLit(tok.drop(1).dropRight(1)))
    else Const(tok)

  private def indexOfWord(s: String, w: String): Int = {
    val i = s.toLowerCase.indexOf(w)
    i
  }

  /** Split on '/' at paren depth 0 — sequence-path steps may be
    * parenthesized groups whose own '/' must not tear.
    */
  private def depth0SlashSplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var d = 0
    s.foreach {
      case '(' => d += 1; cur += '('
      case ')' => d -= 1; cur += ')'
      case '/' if d == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result()
  }

  /** Index of the ')' closing the '(' at `open`; -1 when unbalanced. */
  private def parenCloseOf(s: String, open: Int): Int = {
    var d = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }
}
