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

  test("literal objects with escapes, datatype/lang suffixes, and " +
      "blank nodes parse") {
    val nt = tmp("lit.nt")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """<s:1> <label> "a \"quoted\" value" .
        |<s:1> <age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<s:1> <tag> "chat"@FR .
        |<s:1> <str> "plain"^^<http://www.w3.org/2001/XMLSchema#string> .
        |_:b0 <label> "anon" .
        |""".stripMargin)
    val store = RdfIO.readNTriples(spark, nt)
    // typed literals keep the canonical decorated spelling (round 6:
    // datatype metadata survives ingest instead of being stripped)
    assert(store.slices("age").collect().head.getString(1) ==
      "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    // language tags canonicalize lowercase
    assert(store.slices("tag").collect().head.getString(1) == "\"chat\"@fr")
    // xsd:string collapses to the plain lexical (RDF 1.1 identity)
    assert(store.slices("str").collect().head.getString(1) == "plain")
    // plain literals UNESCAPE at parse (round 11): stored lexical
    // forms hold actual characters — the convention TurtleIO and
    // canonTyped/canonLang always used, now shared by both NT readers
    // (and re-escaped symmetrically by writeNTriples on export)
    assert(store.slices("label").collect().map(_.getString(1)).toSet ==
      Set("a \"quoted\" value", "anon"))
    // data-side blank nodes are opaque node ids
    assert(store.slices("label").collect().map(_.getString(0)).toSet ==
      Set("s:1", "_:b0"))
  }

  test("JSONL document ingestion isolates corrupt lines, never drops or fails") {
    val p = tmp("docs.jsonl")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}
        |{not json at all
        |{"doc_id": 3, "text": "ok", "lang": "en", "source": "books", "n_chars": 2}
        |""".stripMargin)
    val (good, bad) = graft.sources.DocIO.readJsonl(spark, p)
    assert(good.count() == 3 && bad.count() == 1)
    assert(good.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(good.filter(good("doc_id") === 2).select("lang")
      .collect().head.getString(0) == "fr")
  }

  test("CSV document ingestion honors quoting and the explicit schema") {
    val p = tmp("docs.csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      """doc_id,text,lang,source,n_chars
        |1,"a, quoted text",en,web,14
        |2,plain,en,web,5
        |""".stripMargin)
    val (good, bad) = graft.sources.DocIO.readCsv(spark, p)
    assert(good.count() == 2 && bad.count() == 0)
    assert(good.filter(good("doc_id") === 1).select("text")
      .collect().head.getString(0) == "a, quoted text")
  }

  test("CSV round-trip survives delimiters and embedded quotes") {
    import spark.implicits._
    val out = tmp("csv-roundtrip")
    // adversarial fields: the delimiter, doubled quotes, a quote at
    // each end — everything the writer's quote/escape options must
    // protect for the line-based reader to reassemble
    val docs = Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "comma, separated, text", "en", "web", 22L),
      (3L, "she said \"hi\" twice", "en", "books", 19L),
      (4L, "\"leading and trailing\"", "fr", "web", 22L),
      (5L, "mix: a,\"b\",c", "de", "code", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.DocIO.writeCsv(docs, out)
    val (back, bad) = graft.sources.DocIO.readCsv(spark, out)
    assert(bad.count() == 0)
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(
      1L -> "plain text",
      2L -> "comma, separated, text",
      3L -> "she said \"hi\" twice",
      4L -> "\"leading and trailing\"",
      5L -> "mix: a,\"b\",c"))
  }

  test("JSONL round-trip preserves the corpus") {
    val out = tmp("roundtrip")
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    graft.sources.DocIO.writeJsonl(docs, out)
    val (back, bad) = graft.sources.DocIO.readJsonl(spark, out)
    assert(bad.count() == 0)
    assert(back.count() == docs.count())
    // value-level equality via an order-insensitive checksum (hashes
    // reduced mod 1e9+7 so the ANSI-mode sum cannot overflow)
    import org.apache.spark.sql.functions._
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.select((xxhash64(df.columns.map(col): _*) % 1000000007L).as("h"))
        .agg(sum("h")).collect().head.getLong(0)
    assert(sig(back) == sig(docs))
  }

  test("sharded corpus write clusters each file by the sort key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = tmp("shards")
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select((col("doc_id") % 4).as("shard"), col("doc_id"), col("n_chars"))
    graft.sources.DocIO.writeShardedCorpus(docs, out, "shard", "doc_id")
    // directory layout: one shard=<v> dir per shard value
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("shard=0", "shard=1", "shard=2", "shard=3"))
    // nothing lost, and the partition column round-trips
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // within every physical file, doc_id must be non-decreasing —
    // the clustering contract that makes row-group min/max pruning
    // work downstream
    val unsorted = back
      .select(input_file_name().as("f"), col("doc_id"))
      .withColumn("prev", lag("doc_id", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("doc_id"))
    assert(unsorted.count() == 0)
  }
}
