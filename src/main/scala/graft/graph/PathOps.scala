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
}
