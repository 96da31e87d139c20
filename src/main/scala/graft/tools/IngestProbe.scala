package graft.tools

import graft.GraftSession
import graft.bgp.TripleStore
import org.apache.spark.sql.functions._

/** One-off ingest-throughput probe for the RDF sources (SCALE.md
  * evidence): serializes the sf-dir star-schema triples as Turtle and
  * as N-Triples, then times the distributed parse of each
  * (`TurtleIO.turtleDF` / `RdfIO.ntriplesDF` → count). The serialize
  * step is untimed scaffolding; the timed step is the ingest path a
  * user runs on a real dump.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.IngestProbe"`
  */
object IngestProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val triples = TripleStore.fromStarSchema(spark, sfDir).unionView

    // term rendering: subjects are IRI-shaped by construction; objects
    // may be plain literals — quote them (escapes included) so the
    // round trip is exact
    val iriRe = "^[A-Za-z][A-Za-z0-9+.-]*:"
    def obj(c: org.apache.spark.sql.Column) =
      when(c.rlike(iriRe), concat(lit("<"), c, lit(">")))
        .otherwise(concat(lit("\""),
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
          lit("\"")))
    val ttl = triples.select(concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      obj(col("o")), lit(" .")).as("value"))
    val base = "target/ingest_probe"
    ttl.write.mode("overwrite").text(s"$base/ttl")
    ttl.write.mode("overwrite").text(s"$base/nt") // same grammar subset

    def du(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.isFile).map(_.length()).sum
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // N-Quads: the same statements labeled into 8 graphs; TriG: the
    // same, one block per (graph, partition) via the real writer
    val nq = triples.select(concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      obj(col("o")), lit(" <g:"), pmod(xxhash64(col("s")), lit(8)),
      lit("> .")).as("value"))
    nq.write.mode("overwrite").text(s"$base/nq")
    graft.sources.RdfIO.writeTrig(
      triples.select(concat(lit("g:"), pmod(xxhash64(col("s")), lit(8)))
        .as("g"), col("s"), col("p"), col("o")),
      s"$base/trig")

    // warm the page cache evenly, then time each parse
    Seq("ttl", "nt", "nq", "trig").foreach(d =>
      spark.read.textFile(s"$base/$d").count())
    val bytes = du(s"$base/ttl")
    val (nTtl, sTtl) = time(
      graft.sources.TurtleIO.turtleDF(spark, s"$base/ttl").count())
    val (nNt, sNt) = time(
      graft.sources.RdfIO.ntriplesDF(spark, s"$base/nt").count())
    val nqBytes = du(s"$base/nq")
    val (nNq, sNq) = time(
      graft.sources.RdfIO.nquadsDF(spark, s"$base/nq").count())
    val trigBytes = du(s"$base/trig")
    val (nTrig, sTrig) = time(
      graft.sources.TurtleIO.trigAudit(spark, s"$base/trig")
        .where(col("bad").isNull).count())
    // INTRA-block scale probe (round 13): the same corpus as ONE giant
    // graph block in ONE file — the block-grain reader collapses it to
    // a single record on a single task no matter the cluster; the
    // scoped scan splits on the statement terminator and fans out,
    // carrying the block label across splits. This extends the round-12
    // linearity pin past the <=4 MB block regime: throughput should
    // hold (or grow) when the BLOCK grows, not just when blocks
    // multiply.
    val giant = spark.createDataFrame(Seq(Tuple1("<g:all> {"))).toDF("value")
      .unionByName(ttl)
      .unionByName(spark.createDataFrame(Seq(Tuple1("}"))).toDF("value"))
    giant.coalesce(1).write.mode("overwrite").text(s"$base/giant")
    spark.read.textFile(s"$base/giant").count()
    val gBlkBytes = du(s"$base/giant")
    val (nBlk, sBlk) = time(
      graft.sources.TurtleIO.trigAudit(spark, s"$base/giant")
        .where(col("bad").isNull).count())
    val (nScoped, sScoped) = time(
      graft.sources.TurtleIO.scopedTrigAudit(spark, s"$base/giant",
        maxSplitBytes = 8L << 20)
        .where(col("bad").isNull).count())
    require(nBlk == nTtl && nScoped == nTtl,
      s"giant-block row mismatch: block-grain $nBlk scoped $nScoped " +
        s"expected $nTtl")
    println(f"[ingest-probe] giant block (${gBlkBytes / 1e6}%.1f MB, one " +
      f"block, one file): block-grain $sBlk%.2f s " +
      f"(${gBlkBytes / 1e6 / sBlk}%.1f MB/s, single task), scoped " +
      f"$sScoped%.2f s (${gBlkBytes / 1e6 / sScoped}%.1f MB/s)")

    // compressed-dump path: gzip the Turtle corpus into a handful of
    // files (the shape real dumps ship in), then time BOTH halves —
    // the decompress-and-shard rewrite and the sharded parse — against
    // the direct single-task gzip read they replace
    ttl.coalesce(4).write.mode("overwrite")
      .option("compression", "gzip").text(s"$base/ttlgz")
    val gzBytes = du(s"$base/ttlgz")
    val (_, sShard) = time(graft.sources.CompressedIngest
      .decompressAndShard(spark, s"$base/ttlgz", s"$base/ttlgz_shards")
      .collect())
    val (nGz, sGzParse) = time(
      graft.sources.TurtleIO.turtleDF(spark, s"$base/ttlgz_shards").count())
    // SINGLE-file compressed arms (round 13): the shape the most
    // common real download has. gzip: one decompress stream is the
    // intrinsic floor — the pipelined shard step overlaps decompress
    // with shard writes, then the parse fans out over shards. bzip2:
    // block-compressed, Hadoop splits it NATIVELY — zero-copy, the
    // parse fans out inside the one file.
    ttl.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").text(s"$base/ttlgz1")
    val gz1Bytes = du(s"$base/ttlgz1")
    val (_, sShard1) = time(graft.sources.CompressedIngest
      .decompressAndShard(spark, s"$base/ttlgz1", s"$base/ttlgz1_shards")
      .collect())
    val (nGz1, sGz1Parse) = time(
      graft.sources.TurtleIO.turtleDF(spark, s"$base/ttlgz1_shards").count())
    ttl.coalesce(1).write.mode("overwrite")
      .option("compression", "bzip2").text(s"$base/ttlbz1")
    val bz1Bytes = du(s"$base/ttlbz1")
    // probe-scale seam: the fixture is far below the 128 MB default
    // split size, so force ~1 MB splits to demonstrate the intra-file
    // fan-out a real 100 GB dump gets for free
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
    val (nBz1, sBz1) =
      try time(graft.sources.TurtleIO.turtleDF(spark, s"$base/ttlbz1").count())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
    require(nGz1 == nTtl && nBz1 == nTtl,
      s"single-file arms row mismatch: gz $nGz1 bz2 $nBz1 expected $nTtl")
    println(f"[ingest-probe] single-file: gzip(${gz1Bytes / 1e6}%.1f MB) " +
      f"pipelined shard $sShard1%.2f s + parse $sGz1Parse%.2f s " +
      f"(${bytes / 1e6 / (sShard1 + sGz1Parse)}%.1f MB/s uncompressed " +
      f"end-to-end), bzip2(${bz1Bytes / 1e6}%.1f MB) native-split parse " +
      f"$sBz1%.2f s (${bytes / 1e6 / sBz1}%.1f MB/s, zero-copy)")

    println(f"[ingest-probe] corpus: ${bytes / 1e6}%.1f MB, " +
      f"turtle: $nTtl rows in $sTtl%.2f s (${bytes / 1e6 / sTtl}%.1f MB/s), " +
      f"ntriples: $nNt rows in $sNt%.2f s (${bytes / 1e6 / sNt}%.1f MB/s), " +
      f"nquads: $nNq rows in $sNq%.2f s (${nqBytes / 1e6 / sNq}%.1f MB/s), " +
      f"trig: $nTrig rows in $sTrig%.2f s (${trigBytes / 1e6 / sTrig}%.1f MB/s), " +
      f"gzip(${gzBytes / 1e6}%.1f MB): shard $sShard%.2f s + parse " +
      f"$sGzParse%.2f s (${bytes / 1e6 / (sShard + sGzParse)}%.1f MB/s " +
      f"uncompressed end-to-end)")
    require(nTtl == nNt && nNt == nNq && nNq == nTrig && nTrig == nGz,
      s"parser row mismatch: ttl $nTtl nt $nNt nq $nNq trig $nTrig gz $nGz")

    // export half: the real writers over the same relation (cached so
    // the timed step is rendering+writing, not the upstream scan)
    val spo = triples.persist()
    spo.count()
    val (_, wNt) = time(
      graft.sources.RdfIO.writeNTriples(spo, s"$base/w_nt"))
    val (_, wTtl) = time(
      graft.sources.RdfIO.writeTurtle(spo, s"$base/w_ttl"))
    val quads = spo.select(concat(lit("g:"),
      pmod(xxhash64(col("s")), lit(8))).as("g"), col("s"), col("p"),
      col("o"))
    val (_, wNq) = time(
      graft.sources.RdfIO.writeNQuads(quads, s"$base/w_nq"))
    val (_, wTrig) = time(
      graft.sources.RdfIO.writeTrig(quads, s"$base/w_trig"))
    val (_, wGz) = time(graft.sources.RdfIO.writeNTriples(
      spo, s"$base/w_ntgz", codec = Some("gzip")))
    val wBack = graft.sources.TurtleIO.turtleDF(spark, s"$base/w_ttl")
      .count()
    require(wBack == nTtl, s"turtle export re-read $wBack != $nTtl")
    println(f"[ingest-probe] export: " +
      f"ntriples ${du(s"$base/w_nt") / 1e6 / wNt}%.1f MB/s, " +
      f"turtle ${du(s"$base/w_ttl") / 1e6 / wTtl}%.1f MB/s, " +
      f"nquads ${du(s"$base/w_nq") / 1e6 / wNq}%.1f MB/s, " +
      f"trig ${du(s"$base/w_trig") / 1e6 / wTrig}%.1f MB/s, " +
      f"ntriples+gzip ${du(s"$base/w_ntgz") / 1e6 / wGz}%.1f MB/s " +
      f"compressed (${du(s"$base/w_nt") / 1e6 / wGz}%.1f MB/s " +
      "uncompressed-equivalent)")
    spark.stop()
  }
}
