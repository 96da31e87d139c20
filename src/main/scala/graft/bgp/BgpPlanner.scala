package graft.bgp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Sparql._

/** BGP → DataFrame planner.
  *
  * Reference lifecycle (SURVEY.md §3.1): parse → query graph → join
  * vertices (degree>1) → per-vertex subqueries → distributed hash joins
  * along graph edges. Spark-native translation: one filtered scan of
  * the triple table per pattern, then an inner natural join chain on
  * all shared variables (exactly the observable semantics of the
  * reference's multi-key hash join J2, BasicHashJoin.cpp:589-611),
  * with Catalyst/AQE playing the role of DREAM's cost-based optimizer
  * (SURVEY.md §4.4). Bag semantics throughout — the reference never
  * dedups (BasicHashJoin.cpp:571-587).
  *
  * Plan-shape choices for scale:
  *  - pattern scans filter on constants first (predicate pushdown into
  *    the triple scan — with a parquet store partitioned by `p` this
  *    becomes partition pruning);
  *  - join order: start at the most-constant pattern and grow the join
  *    tree only along shared variables, so no accidental cartesian
  *    products; AQE re-plans sizes at runtime;
  *  - the final projection prunes to SELECT vars with lexicographic
  *    column canonicalization (reference O2, QueryPlanner.c:839-860).
  */
object BgpPlanner {

  /** Query-graph metadata (reference createGraph QueryPlanner.c:192-223;
    * identifyJoinNodes 226-239; assignConditionsToNodes 242-288).
    * Planner-side only — O(#patterns), never data-sized.
    */
  final case class QueryGraph(
      vertices: Set[Term],
      degree: Map[Term, Int],
      joinVertices: Set[Term],
      exclusive: Map[Term, Seq[TriplePattern]],
      shared: Seq[TriplePattern])

  def analyze(q: BgpQuery): QueryGraph = {
    val endpoints: Seq[(Term, TriplePattern)] =
      q.patterns.flatMap(p => Seq(p.s -> p, p.o -> p))
    val degree = endpoints.groupBy(_._1).map { case (t, xs) => t -> xs.size }
    val joinVertices = degree.filter(_._2 > 1).keySet
    // A pattern with exactly one join-vertex endpoint is EXCLUSIVE to
    // it; with two it is SHARED (QueryPlanner.c:259-277).
    val (excl, shr) = q.patterns.partition(p =>
      Seq(p.s, p.o).count(joinVertices.contains) <= 1)
    val exclusive = excl
      .flatMap(p => Seq(p.s, p.o).find(joinVertices.contains).map(_ -> p))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    QueryGraph(degree.keySet.toSet, degree, joinVertices, exclusive, shr)
  }

  /** Compile one pattern to a scan.
    *
    * Constant-predicate patterns (all of the reference's fixtures)
    * dispatch to the predicate's vertical slice — a pruned 2-column
    * scan of one base table; an unknown predicate short-circuits to an
    * empty relation (entry point C, Proxy.c:71-85). Variable-predicate
    * patterns fall back to the union view. Remaining constants filter,
    * variables project/rename, and a repeated variable within one
    * pattern becomes an equality filter.
    */
  private def patternScan(store: TripleStore, pat: TriplePattern,
      encode: String => Column): DataFrame = {
    def slice(p: String): DataFrame = store.slices.getOrElse(p, {
      val any = store.slices.values.head
      any.filter(lit(false))
    })
    val (base, pos) = pat.p match {
      case Const(p) =>
        (slice(p), Seq("s" -> pat.s, "o" -> pat.o))
      case PathPlus(p) =>
        // property path p+ = transitive closure of the predicate slice
        val closed = graft.graph.PathOps
          .transitiveClosure(slice(p).toDF("src", "dst"))
          .toDF("s", "o")
        (closed, Seq("s" -> pat.s, "o" -> pat.o))
      case Var(_) =>
        (store.unionView, Seq("s" -> pat.s, "p" -> pat.p, "o" -> pat.o))
    }
    val constFilter = pos.collect { case (c, Const(v)) => col(c) === encode(v) }
    val filtered = constFilter.foldLeft(base)((df, f) => df.filter(f))
    val varPos = pos.collect { case (c, Var(n)) => (c, n) }
    // repeated variable inside one pattern ⇒ positions must be equal
    // (pairwise against the first occurrence — a chained reduce of ===
    // would compare a boolean to the third column)
    val dupFilters = varPos.groupBy(_._2).values.filter(_.size > 1)
      .map(g => g.tail.map(x => col(g.head._1) === col(x._1)).reduce(_ && _))
    val selfEq = dupFilters.foldLeft(filtered)((df, f) => df.filter(f))
    val firstPos = varPos.groupBy(_._2).map { case (n, xs) => xs.head._1 -> n }
    selfEq.select(firstPos.toSeq.map { case (c, n) => col(c).as(n) }: _*)
  }

  /** Build the join-chain plan over a triple store. Returns columns =
    * SELECT vars, lexicographically sorted.
    */
  /** Greedy join chain — DREAM enumerates and costs candidate plans
    * from measured sizes (Optimizer.cpp:63-103); the Spark-side
    * analog orders the chain by a static selectivity proxy
    * (#constants in the pattern: a 2-constant pattern scans a thin
    * filtered slice, an all-variable pattern a whole slice), growing
    * only along shared variables, with AQE correcting strategy/skew
    * at runtime from real sizes. Catalyst's CBO join reorder needs
    * catalog stats, which path-derived DataFrames lack, so the chain
    * order chosen here is the executed join order.
    */
  private def chain(patterns: Seq[TriplePattern],
      scans: Seq[DataFrame]): DataFrame = {
    def constness(i: Int): Int = 3 - patterns(i).vars.distinct.size
    val seedIdx = scans.indices.maxBy(constness)
    var joined = scans(seedIdx)
    var done = Set(seedIdx)
    var cols = joined.columns.toSet
    while (done.size < scans.size) {
      val remaining = scans.indices.filterNot(done)
      val connected = remaining.filter(i => scans(i).columns.exists(cols))
      val next =
        if (connected.nonEmpty) connected.maxBy(constness)
        else remaining.maxBy(constness)
      val scan = scans(next)
      val common = scan.columns.filter(cols).toSeq
      joined =
        if (common.nonEmpty) joined.join(scan, common, "inner")
        else joined.crossJoin(scan)
      cols ++= scan.columns
      done += next
    }
    joined
  }

  def plan(store: TripleStore, q: BgpQuery): DataFrame = {
    val encode: String => Column =
      if (store.encoded) v => xxhash64(lit(v)) else v => lit(v)

    var joined = chain(q.patterns,
      q.patterns.map(patternScan(store, _, encode)))

    // OPTIONAL blocks: each is its own sub-chain, left-outer joined on
    // the shared variables (standard SPARQL OPTIONAL ≡ left join)
    for (block <- q.optionals) {
      val sub = chain(block, block.map(patternScan(store, _, encode)))
      val common = sub.columns.filter(joined.columns.toSet).toSeq
      joined =
        if (common.nonEmpty) joined.join(sub, common, "left_outer")
        // disconnected OPTIONAL still keeps unmatched rows (a crossJoin
        // would drop every row when the block is empty)
        else joined.join(sub, lit(true), "left_outer")
    }

    // FILTER comparisons, applied post-join. Equality ops work on the
    // encoded store by encoding the literal; ordering comparisons need
    // lexical values, so they require a string-form store.
    for (f <- q.filters) {
      val c = col(f.variable)
      val cond = (f.op, f.numeric) match {
        case ("=", _) => c === encode(f.value)
        case ("!=", _) => c =!= encode(f.value)
        case (op, numeric) =>
          require(!store.encoded,
            s"FILTER $op needs lexical values; decode the store first")
          val (l, r) =
            if (numeric) (c.cast("double"), lit(f.value.toDouble))
            else (c, lit(f.value): Column)
          op match {
            case ">" => l > r
            case ">=" => l >= r
            case "<" => l < r
            case "<=" => l <= r
          }
      }
      joined = joined.filter(cond)
    }

    val projected = joined.select(q.select.distinct.sorted.map(col): _*)
      .transform(df => if (q.distinct) df.distinct() else df)
    store.dict match {
      case None => projected
      case Some(dict) =>
        // Decode ALL output columns in ONE pass over the dictionary:
        // unpivot (rid, var, id), join the dict once, pivot back. Per-
        // column joins would scan the data-sized dict once per
        // variable (or worse, pin it in a broadcast); here the dict is
        // streamed once and AQE broadcasts the result-sized unpivoted
        // side. The pivot shuffle is result-sized, never data-sized.
        val sel = q.select.distinct.sorted
        val withId = projected.withColumn("__rid", monotonically_increasing_id())
        val kvs = sel.flatMap(v => Seq(lit(v): Column, col(v)))
        val long = withId.select(col("__rid"),
          explode(map(kvs: _*)).as(Seq("__var", "__id")))
        long.join(dict, long("__id") === dict("id"))
          .select(col("__rid"), col("__var"), col("value"))
          .groupBy("__rid").pivot("__var", sel).agg(first(col("value")))
          .select(sel.map(col): _*)
    }
  }

  /** Parse + plan in one step. */
  def query(store: TripleStore, sparql: String): DataFrame =
    plan(store, Sparql.parse(sparql))
}
