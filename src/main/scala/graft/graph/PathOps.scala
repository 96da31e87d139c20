package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive path evaluation over an edge DataFrame — the capability
  * behind SPARQL 1.1 property paths (`p+`), which the reference's BGP
  * subset lacks and Spark has no native operator for.
  *
  * Semi-naive evaluation (the datalog fixpoint algorithm): each
  * iteration extends only the NEW pairs of the previous round (the
  * delta) by one edge hop, anti-joins out already-known pairs, and
  * stops when the delta is empty. Joining the delta instead of the
  * whole closure keeps per-iteration work proportional to new facts —
  * on a cluster each iteration is one shuffle of the delta, and the
  * closure accumulates in cached partitions.
  */
object PathOps {

  /** All (src, dst) pairs connected by ≥1 hop. `edges` must have
    * columns (src, dst). maxIter bounds runaway growth; the loop exits
    * at fixpoint.
    *
    * Path doubling (closure ⋈ closure each round) reaches paths of
    * length 2^k after k rounds, so a diameter-d graph needs ⌈log₂ d⌉
    * rounds versus d for one-hop semi-naive extension — on Spark,
    * where each round is a scheduled job, round count dominates
    * wall-clock. localCheckpoint (eager) after every round: without it
    * each round's plan embeds all previous rounds' plans and optimizer
    * time grows exponentially with depth — the classic iterative-Spark
    * lineage blowup.
    */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    var closure = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)
    var size = closure.count()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // toDF renames mint fresh attribute ids on both sides, keeping
      // the (checkpointed) self-join unambiguous
      val doubled = closure.toDF("a", "mid")
        .join(closure.toDF("mid", "c"), "mid")
        .select(col("a").as("src"), col("c").as("dst"))
        .unionByName(closure)
        .distinct()
        .localCheckpoint(eager = true)
      val newSize = doubled.count()
      if (newSize == size) done = true
      else { closure = doubled; size = newSize; iter += 1 }
    }
    closure
  }

  /** Min-hop distance for every connected (src, dst) pair (BFS depth,
    * all sources at once) — min-plus path doubling: each round joins
    * the distance relation with itself, adds the two legs, and keeps
    * the per-pair minimum, so after k rounds every distance up to 2^k
    * hops is exact. Same ⌈log₂ d⌉ round count and localCheckpoint
    * lineage hygiene as [[transitiveClosure]]; the fixpoint test
    * compares (pair count, total distance) so a round that only
    * SHORTENS known pairs still registers as change.
    */
  def shortestHops(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    def snap(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var dist = edges.select(col("src"), col("dst")).distinct()
      .withColumn("d", lit(1L))
      .localCheckpoint(eager = true)
    var state = snap(dist)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val doubled = dist.toDF("a", "mid", "d1")
        .join(dist.toDF("mid", "c", "d2"), "mid")
        .select(col("a").as("src"), col("c").as("dst"),
          (col("d1") + col("d2")).as("d"))
        .unionByName(dist)
        .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
        .localCheckpoint(eager = true)
      val ns = snap(doubled)
      if (ns == state) done = true
      else { dist = doubled; state = ns; iter += 1 }
    }
    dist
  }

  /** Vertices of the k-core (maximal subgraph where every vertex keeps
    * degree ≥ k) — iterative peeling to the fixpoint. `edges` must be
    * the SYMMETRIZED distinct edge set (both directions present), so
    * degree = count of rows per src.
    *
    * The k-core is order-independent (the fixpoint is unique no matter
    * which low-degree vertex peels first), which is what makes a
    * distributed bulk peel correct: each round drops EVERY vertex
    * currently under degree k at once — one aggregation + two
    * semi-joins, all keyed on the vertex — and converges in at most
    * the peel depth of the graph (rounds are a data property, ≤4 on
    * the test corpus; degeneracy-bounded, not size-bounded, at 100×).
    * Same localCheckpoint lineage hygiene as [[transitiveClosure]].
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    var ed = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)
    var m = ed.count()
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      val alive = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src"))
      val pruned = ed
        .join(alive, Seq("src"), "left_semi")
        .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = true)
      val m2 = pruned.count()
      if (m2 == m) done = true
      else { ed = pruned; m = m2; iter += 1 }
    }
    ed.select(col("src").as("v")).distinct()
  }
}
