package graft.bgp

import graft.scale.GuardedBroadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SPARQL 1.1 Update — the graph-mutation slice (`INSERT DATA`,
  * `DELETE DATA`, `DELETE WHERE`), parity-plus: the reference grammar
  * (QueryPlanner.c:933-999) is read-only, but no user of a real RDF
  * store runs reads forever. Semantics follow SPARQL 1.1 Update §3.1:
  * graphs are SETS (inserting an existing triple is a no-op, deleting
  * an absent one is a no-op), DATA blocks are ground (no variables),
  * and `DELETE WHERE`'s pattern group is both the match and the
  * template — every triple instantiated by a solution is removed.
  *
  * Updates are functional over the immutable [[TripleStore]]: each op
  * maps `predicate → DataFrame(s,o)` slices to new slices via
  * union-distinct (insert) or left-anti join (delete) — the same apply
  * shapes as the lakehouse CDC merge (q202: latest-wins upsert =
  * union + anti semantics), per-predicate so an op touches only the
  * slices it names. The DERIVED s-bucketed secondary layout is
  * dropped by a default-graph update the way a format bump invalidates
  * the persisted store — it rebuilds from the new slices; the quads
  * relation is separate GRAPH data (not derived), so default-graph
  * updates leave named graphs standing, exactly as §3.1 scopes them.
  *
  * Both encodings are first-class: on the encoded store an insert
  * hashes the new terms (ids are derivable without a dictionary
  * join — the whole point of hash ids) and appends their
  * (id, value, dt, lang) rows to the dict, then re-runs the
  * store-build collision audit over the grown vocabulary; deletes
  * hash their ground terms and anti-join in id space. Dict entries of
  * deleted terms are kept — dictionaries are append-only, as in
  * RDF-3X's, and an orphaned entry is harmless.
  */
object SparqlUpdate {

  sealed trait UpdateOp
  final case class InsertData(triples: Seq[(String, String, String)])
      extends UpdateOp
  final case class DeleteData(triples: Seq[(String, String, String)])
      extends UpdateOp
  final case class DeleteWhere(patterns: Seq[Sparql.TriplePattern])
      extends UpdateOp

  /** The full §3.1.3 DELETE/INSERT form: `where` binds, `deleteTmpl`
    * then `insertTmpl` instantiate under every solution (deletes apply
    * before inserts, both against the ORIGINAL store's bindings).
    */
  final case class Modify(
      deleteTmpl: Seq[Sparql.TriplePattern],
      insertTmpl: Seq[Sparql.TriplePattern],
      where: Seq[Sparql.TriplePattern]) extends UpdateOp

  // ——— §3.2 graph management over the store's named-graph quads ———
  case object ClearDefault extends UpdateOp
  final case class ClearGraph(g: String) extends UpdateOp
  /** §3.2.5 ADD/COPY/MOVE between named graphs: COPY replaces the
    * target's content with the source's, MOVE additionally drops the
    * source, ADD unions into the target (set semantics).
    */
  final case class GraphOp(op: String, from: String, to: String)
      extends UpdateOp

  /** §3.2.1 LOAD: ingest an N-Triples document into a named graph —
    * the distributed text parse (RdfIO's S1-grade reader) unioned
    * into the quads relation with set semantics; on the encoded store
    * the loaded vocabulary grows the dict (audited, DataFrame-sized —
    * never collected to the driver).
    */
  final case class Load(path: String, graph: String) extends UpdateOp

  private val insDataRe = "(?is)^\\s*INSERT\\s+DATA\\s*\\{(.*)\\}\\s*$".r
  private val delDataRe = "(?is)^\\s*DELETE\\s+DATA\\s*\\{(.*)\\}\\s*$".r
  private val delWhereRe = "(?is)^\\s*DELETE\\s+WHERE\\s*\\{(.*)\\}\\s*$".r
  private val modifyRe =
    ("(?is)^\\s*(?:DELETE\\s*\\{([^{}]*)\\}\\s*)?" +
      "(?:INSERT\\s*\\{([^{}]*)\\}\\s*)?WHERE\\s*\\{([^{}]*)\\}\\s*$").r
  private val clearRe =
    "(?is)^\\s*CLEAR\\s+(?:DEFAULT|GRAPH\\s+<([^>]*)>)\\s*$".r
  private val graphOpRe =
    ("(?is)^\\s*(ADD|COPY|MOVE)\\s+GRAPH\\s+<([^>]*)>" +
      "\\s+TO\\s+GRAPH\\s+<([^>]*)>\\s*$").r
  private val loadRe =
    "(?is)^\\s*LOAD\\s+<([^>]*)>\\s+INTO\\s+GRAPH\\s+<([^>]*)>\\s*$".r

  /** Parse an update request: one or more operations separated by `;`
    * (brace-depth-aware, so a `;` inside a block or literal is data).
    */
  def parse(text: String): Seq[UpdateOp] =
    splitOps(text).map {
      case insDataRe(body) => InsertData(groundTriples(body))
      case delDataRe(body) => DeleteData(groundTriples(body))
      case delWhereRe(body) =>
        val pats = patternsOf(body)
        val isGround = pats.forall(tp =>
          Seq(tp.s, tp.p, tp.o).forall(_.isInstanceOf[Sparql.Const]))
        if (isGround)
          // variable-free DELETE WHERE degenerates to DELETE DATA
          DeleteData(pats.map(tp => (constOf(tp.s), constOf(tp.p),
            constOf(tp.o))))
        else DeleteWhere(pats)
      case modifyRe(delT, insT, whereT) if delT != null || insT != null =>
        val del = Option(delT).map(patternsOf).getOrElse(Nil)
        val ins = Option(insT).map(patternsOf).getOrElse(Nil)
        val where = patternsOf(whereT)
        val bound = where.flatMap(tp => Seq(tp.s, tp.o))
          .collect { case Sparql.Var(n) => n }.toSet
        (del ++ ins).flatMap(tp => Seq(tp.s, tp.o))
          .collect { case Sparql.Var(n) => n }
          .foreach(v => require(bound(v),
            s"template var ?$v is not bound by the WHERE group"))
        Modify(del, ins, where)
      case clearRe(g) => if (g == null) ClearDefault else ClearGraph(g)
      case graphOpRe(op, from, to) => GraphOp(op.toUpperCase, from, to)
      case loadRe(path, g) => Load(path, g)
      case other => throw new IllegalArgumentException(
        "unsupported update operation (INSERT DATA / DELETE DATA / " +
          "DELETE WHERE / DELETE-INSERT-WHERE / CLEAR / ADD / COPY / " +
          s"MOVE / LOAD): '${other.take(80)}'")
    }

  /** Parse + fold a whole request over a store. */
  def applyAll(spark: SparkSession, store: TripleStore,
      text: String): TripleStore =
    parse(text).foldLeft(store)((st, op) => apply(spark, st, op))

  def apply(spark: SparkSession, store: TripleStore,
      op: UpdateOp): TripleStore = {
    import spark.implicits._
    // store-form (s, o) rows: lexical on the string store, xxhash64
    // ids on the encoded store (re-derived hash-side, the same
    // shortcut BgpPlanner uses for constants)
    def pairs(ts: Seq[(String, String, String)], p: String): DataFrame = {
      val rows = ts.filter(_._2 == p).map(t => (t._1, t._3)).toDF("s", "o")
      if (store.encoded)
        rows.select(xxhash64($"s").as("s"), xxhash64($"o").as("o"))
      else rows
    }
    op match {
      case InsertData(ts) =>
        val slices = ts.map(_._2).distinct.foldLeft(store.slices) {
          (sl, p) =>
            val add = pairs(ts, p)
            sl.updated(p,
              sl.get(p).map(_.unionByName(add)).getOrElse(add).distinct())
        }
        val dict = store.dict.map(d =>
          growDict(spark, d, ts.flatMap(t => Seq(t._1, t._3)).distinct))
        store.copy(slices = slices, dict = dict, sBucketed = None)

      case DeleteData(ts) =>
        val slices = ts.map(_._2).distinct.foldLeft(store.slices) {
          (sl, p) =>
            sl.get(p) match {
              case None => sl // deleting from an absent graph: no-op
              case Some(df) => sl.updated(p,
                df.join(GuardedBroadcast.maybe(pairs(ts, p)),
                  Seq("s", "o"), "left_anti"))
            }
        }
        store.copy(slices = slices, sBucketed = None)

      // DELETE WHERE is §3.1.3's Modify with the pattern group serving
      // as both the match and the (only) template
      case DeleteWhere(pats) => applyModify(spark, store, pats, Nil, pats)

      case Modify(del, ins, where) =>
        applyModify(spark, store, del, ins, where)

      case ClearDefault =>
        // empty every slice but keep schemas — a cleared store still
        // answers queries (with zero rows); derived layouts drop like
        // on any mutation
        store.copy(slices = store.slices.map { case (p, df) =>
          p -> df.limit(0)
        }, sBucketed = None)

      case ClearGraph(g) =>
        store.copy(quads = Some(namedGraphs(store, "CLEAR GRAPH")
          .filter(col("g") =!= gid(store, g))))

      case GraphOp(op, from, to) =>
        val quads = namedGraphs(store, s"$op GRAPH")
        val relabeled = quads.filter(col("g") === gid(store, from))
          .withColumn("g", gid(store, to))
        val newQuads = op match {
          // ADD unions (set semantics); COPY replaces the target's
          // content; MOVE additionally drops the source (§3.2.5)
          case "ADD" => quads.unionByName(relabeled).distinct()
          case "COPY" =>
            quads.filter(col("g") =!= gid(store, to)).unionByName(relabeled)
          case "MOVE" =>
            quads.filter(col("g") =!= gid(store, to) &&
              col("g") =!= gid(store, from)).unionByName(relabeled)
          case other => throw new IllegalArgumentException(other)
        }
        // a graph op can mint a NEW graph NAME (`to`): on the encoded
        // store it must decode, so the dict grows by that one term
        val dict = store.dict.map(d => growDict(spark, d, Seq(to)))
        store.copy(quads = Some(newQuads), dict = dict)

      case Load(path, g) =>
        import spark.implicits._
        val triples = graft.sources.RdfIO.ntriplesDF(spark, path)
        val asQuads = triples.select(gid(store, g).as("g"),
          (if (store.encoded) xxhash64(col("s")) else col("s")).as("s"),
          col("p"),
          (if (store.encoded) xxhash64(col("o")) else col("o")).as("o"))
        val quads = store.quads match {
          case Some(q) => q.unionByName(asQuads).distinct()
          case None => asQuads.distinct() // first named graph of the store
        }
        val dict = store.dict.map { d =>
          val vocab = triples.select(col("s").as("value"))
            .unionByName(triples.select(col("o").as("value")))
            .unionByName(Seq(g).toDF("value"))
            .distinct()
          growDictDf(spark, d, vocab)
        }
        store.copy(quads = Some(quads), dict = dict)
    }
  }

  /** Graph name in store form (lexical, or xxhash64 id when encoded). */
  private def gid(store: TripleStore, g: String) =
    if (store.encoded) xxhash64(lit(g)) else lit(g)

  private def namedGraphs(store: TripleStore, what: String): DataFrame =
    store.quads.getOrElse(throw new IllegalArgumentException(
      s"$what needs a store with named graphs (quads)"))

  /** Shared §3.1.3 evaluation: `where` binds once against the ORIGINAL
    * store; the delete template applies first (per-slice anti-join),
    * then the insert template (per-slice union-distinct — new
    * predicates create new slices). The planner DECODES bindings to
    * lexical values at its result edge, so on the encoded store the
    * templates re-derive ids by hashing them — the same value→id
    * shortcut constants use; insert-template CONSTANTS may be new
    * vocabulary and grow the dict (audited), while var bindings came
    * from the store and are already in it.
    */
  private def applyModify(
      spark: SparkSession,
      store: TripleStore,
      delTmpl: Seq[Sparql.TriplePattern],
      insTmpl: Seq[Sparql.TriplePattern],
      where: Seq[Sparql.TriplePattern]): TripleStore = {
    import spark.implicits._
    (delTmpl ++ insTmpl ++ where).foreach(tp =>
      require(tp.p.isInstanceOf[Sparql.Const],
        "updates support constant predicates (the slice dispatch " +
          s"key); got ${tp.p}"))
    val vars = where.flatMap(tp => Seq(tp.s, tp.o))
      .collect { case Sparql.Var(n) => n }.distinct
    require(vars.nonEmpty,
      "variable-free updates use INSERT DATA / DELETE DATA")
    val bind = BgpPlanner.plan(store,
      Sparql.BgpQuery(select = vars, patterns = where))
    def instantiate(tmpl: Seq[Sparql.TriplePattern]): Option[DataFrame] =
      if (tmpl.isEmpty) None
      else Some(tmpl.map { tp =>
        def c(t: Sparql.Term) = t match {
          case Sparql.Var(n) =>
            if (store.encoded) xxhash64(col(n)) else col(n)
          case Sparql.Const(v) =>
            if (store.encoded) xxhash64(lit(v)) else lit(v)
          case other => throw new IllegalArgumentException(
            s"update templates are plain triples; got $other")
        }
        bind.select(c(tp.s).as("s"), lit(constOf(tp.p)).as("p"),
          c(tp.o).as("o"))
      }.reduce(_ unionByName _).distinct())
    var slices = store.slices
    instantiate(delTmpl).foreach { del =>
      val touched = delTmpl.map(tp => constOf(tp.p)).toSet
      slices = slices.map {
        case (p, df) if touched(p) => p ->
          df.join(GuardedBroadcast.maybe(
            del.filter($"p" === p).select($"s", $"o")),
            Seq("s", "o"), "left_anti")
        case kv => kv
      }
    }
    instantiate(insTmpl).foreach { insAll =>
      insTmpl.map(tp => constOf(tp.p)).distinct.foreach { p =>
        val add = insAll.filter($"p" === p).select($"s", $"o")
        slices = slices.updated(p,
          slices.get(p).map(_.unionByName(add)).getOrElse(add).distinct())
      }
    }
    val dict =
      if (insTmpl.isEmpty) store.dict
      else store.dict.map { d =>
        val consts = insTmpl.flatMap(tp => Seq(tp.s, tp.o))
          .collect { case Sparql.Const(v) => v }.distinct
        if (consts.isEmpty) d else growDict(spark, d, consts)
      }
    store.copy(slices = slices, dict = dict, sBucketed = None)
  }

  /** Append `values`' (id, value, dt, lang) rows to the dict and re-run
    * the store-build collision audit over the grown vocabulary: an
    * insert must not silently alias two terms (TripleStore.encode
    * scaladoc).
    */
  private def growDict(spark: SparkSession, d: DataFrame,
      values: Seq[String]): DataFrame = {
    import spark.implicits._
    growDictDf(spark, d, values.toDF("value"))
  }

  /** [[growDict]] over a DataFrame vocabulary (a LOAD's term set is
    * data-sized and never collects to the driver).
    */
  private def growDictDf(spark: SparkSession, d: DataFrame,
      values: DataFrame): DataFrame = {
    import spark.implicits._
    val newTerms = values
      .select(xxhash64($"value").as("id"), $"value",
        RdfLex.datatype($"value").as("dt"),
        RdfLex.lang($"value").as("lang"))
    val grown = d.unionByName(newTerms)
      .groupBy($"id").agg(
        first($"value").as("value"), first($"dt").as("dt"),
        first($"lang").as("lang"),
        countDistinct($"value").as("_nv"))
    val clash = grown.filter($"_nv" > 1).take(1)
    if (clash.nonEmpty) throw new IllegalStateException(
      s"dictionary id collision on insert (id=${clash.head.get(0)}" +
        s", one value='${clash.head.get(1)}') — see " +
        "TripleStore.encode scaladoc")
    grown.drop("_nv")
  }

  // ——— parsing helpers ———

  /** Split on top-level `;` only — depth-aware over `{}` and quotes. */
  private def splitOps(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    text.foreach { ch =>
      if (ch == '"') inQuote = !inQuote
      if (!inQuote) {
        if (ch == '{') depth += 1
        if (ch == '}') depth -= 1
      }
      if (ch == ';' && depth == 0 && !inQuote) {
        out += cur.toString; cur.clear()
      } else cur += ch
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Ground (variable-free) triples of a DATA block, in the same
    * canonical term spellings the pattern parser produces.
    */
  private def groundTriples(body: String): Seq[(String, String, String)] =
    triplesOf(body).map { toks =>
      (groundTerm(toks(0)), groundTerm(toks(1)), groundTerm(toks(2)))
    }

  private def patternsOf(body: String): Seq[Sparql.TriplePattern] =
    triplesOf(body).map { toks =>
      def t(tok: String): Sparql.Term =
        if (tok.startsWith("?")) Sparql.Var(tok.drop(1))
        else Sparql.Const(groundTerm(tok))
      Sparql.TriplePattern(t(toks(0)), t(toks(1)), t(toks(2)))
    }

  private def triplesOf(body: String): Seq[Seq[String]] =
    body.split("\\s+\\.\\s+|\\s+\\.\\s*$|^\\s*\\.\\s+").toSeq
      .map(_.trim).filter(s => s.nonEmpty && s != ".")
      .map { line =>
        val toks = Sparql.termTokenRe.findAllIn(line).toSeq
        require(toks.length == 3,
          s"a triple needs exactly 3 terms, got '${line}'")
        toks
      }

  /** Canonical ground term: `<uri>` strips brackets, literals take the
    * same RDF 1.1 canonical spellings as query constants (typed via
    * canonTyped, tagged via canonLang, plain quotes stripped); bare
    * tokens pass through. Variables are illegal in ground positions.
    */
  private def groundTerm(tok: String): String = {
    require(!tok.startsWith("?"),
      s"DATA blocks are ground — no variables: $tok")
    tok match {
      case Sparql.typedLitRe(lex, uri, curie) =>
        Sparql.canonTyped(lex, if (uri != null) uri else curie)
      case Sparql.langLitRe(lex, lang) => Sparql.canonLang(lex, lang)
      case t if t.startsWith("<") && t.endsWith(">") =>
        t.drop(1).dropRight(1)
      case t if t.startsWith("\"") && t.endsWith("\"") && t.length >= 2 =>
        t.drop(1).dropRight(1)
      case t => t
    }
  }

  private def constOf(t: Sparql.Term): String = t match {
    case Sparql.Const(v) => v
    case other => throw new IllegalArgumentException(
      s"expected a ground term, got $other")
  }
}
