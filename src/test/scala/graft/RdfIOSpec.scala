package graft

import graft.bgp.BgpPlanner
import graft.sources.RdfIO
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RdfIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-io").toString
    s"$d/$name"
  }

  test("N-Triples round-trip: load, BGP-query, sink") {
    val nt = tmp("data.nt")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """# LUBM-Q4-shaped fixture (reference LUBMQueries/Query4:1)
        |<prof:0> <worksFor> <dept:0> .
        |<prof:1> <worksFor> <dept:0> .
        |<prof:0> <name> "FullProfessor0" .
        |<prof:1> <name> "FullProfessor1" .
        |<prof:0> <email> "p0@u.edu" .
        |malformed line without terms
        |""".stripMargin)
    val store = RdfIO.readNTriples(spark, nt)
    assert(store.slices.keySet == Set("worksFor", "name", "email"))

    val out = BgpPlanner.query(store,
      "select ?A ?N where { ?A worksFor dept:0 . ?A name ?N }")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(
      ("prof:0", "FullProfessor0"), ("prof:1", "FullProfessor1")))

    val sink = tmp("result")
    assert(RdfIO.writeResult(out, sink) == 2L)
    val lines = spark.read.textFile(sink).collect().toSet
    assert(lines == Set("prof:0\tFullProfessor0", "prof:1\tFullProfessor1"))
  }

  test("empty result writes the reference sentinel (golden Result-Q2:1)") {
    val store = {
      import spark.implicits._
      graft.bgp.TripleStore.fromTriples(
        Seq(("a", "p", "b")).toDF("s", "p", "o"))
    }
    val out = BgpPlanner.query(store, "select ?X where { ?X nosuch ?Y }")
    val sink = tmp("empty")
    assert(RdfIO.writeResult(out, sink) == 0L)
    assert(spark.read.textFile(sink).collect().toSeq == Seq("<empty result>"))
  }

  test("literal objects with escapes and datatype suffixes parse") {
    val nt = tmp("lit.nt")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """<s:1> <label> "a \"quoted\" value" .
        |<s:1> <age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |""".stripMargin)
    val store = RdfIO.readNTriples(spark, nt)
    assert(store.slices("age").collect().head.getString(1) == "42")
    assert(store.slices("label").collect().head.getString(1) == "a \\\"quoted\\\" value")
  }
}
