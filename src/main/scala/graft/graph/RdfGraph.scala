package graft.graph

import graft.bgp.TripleStore
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics view of the triple store (GraphX).
  *
  * The reference models each QUERY as a graph (vertices = variables/
  * constants, edges = triple patterns — createGraph
  * QueryPlanner.c:192-223) but never analyzes the DATA as a graph.
  * This module adds that capability: the triple store IS an edge list,
  * so entity-graph analytics (degrees, components, PageRank) come from
  * GraphX over the same slices the BGP planner scans.
  *
  * Scale notes: vertex IDs are xxhash64 of the lexical form — the same
  * deterministic, shuffle-free encoding the dictionary path uses
  * (TripleStore.encode), so graph construction is one projection per
  * slice plus a distinct for the vertex table; no global ID assignment
  * step. GraphX partitions edges via its PartitionStrategy; analytics
  * run on the partitioned edge RDD exactly as they would on a
  * 1000-executor cluster.
  */
object RdfGraph {

  /** Build a GraphX graph from the store's entity→entity predicates
    * (literal-valued predicates like `name` carry no graph structure
    * and are excluded by the caller's predicate choice).
    */
  def fromStore(store: TripleStore, predicates: Seq[String]): Graph[String, String] = {
    val edgesDf = predicates
      .flatMap(p => store.slices.get(p).map(df =>
        df.select(col("s"), lit(p).as("p"), col("o"))))
      .reduce(_ unionByName _)
    val verts = edgesDf.select(col("s").as("v"))
      .unionByName(edgesDf.select(col("o").as("v")))
      .distinct()
    val vertexRdd = verts.select(xxhash64(col("v")).as("id"), col("v"))
      .rdd.map(r => (r.getLong(0): VertexId, r.getString(1)))
    val edgeRdd = edgesDf
      .select(xxhash64(col("s")), xxhash64(col("o")), col("p"))
      .rdd.map(r => Edge(r.getLong(0): VertexId, r.getLong(1): VertexId, r.getString(2)))
    Graph(vertexRdd, edgeRdd)
  }

  /** Per-entity (in+out) degree, back as a DataFrame for the SQL
    * surface.
    */
  def degrees(g: Graph[String, String], spark: SparkSession): DataFrame = {
    import spark.implicits._
    val deg = g.degrees
    g.vertices.join(deg).map { case (_, (name, d)) => (name, d.toLong) }
      .toDF("entity", "degree")
  }

  /** Connected components over the undirected entity graph; output is
    * (entity, component-representative-entity) so results are
    * ID-scheme-independent.
    */
  def components(g: Graph[String, String], spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cc = g.connectedComponents().vertices // (vid, min-vid of component)
    val names = g.vertices
    cc.join(names) // (vid, (compId, name))
      .map { case (_, (comp, name)) => (comp, name) }
      .toDF("comp_id", "entity")
      .withColumn("component",
        min(col("entity")).over(org.apache.spark.sql.expressions.Window.partitionBy("comp_id")))
      .select(col("entity"), col("component"))
  }

  /** PageRank over the directed entity graph. */
  def pageRank(g: Graph[String, String], spark: SparkSession,
      tol: Double = 0.0001): DataFrame = {
    import spark.implicits._
    val pr = g.pageRank(tol).vertices
    g.vertices.join(pr).map { case (_, (name, rank)) => (name, rank) }
      .toDF("entity", "rank")
  }
}
