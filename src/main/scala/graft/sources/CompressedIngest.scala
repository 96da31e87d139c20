package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed decompress-and-shard for NON-SPLITTABLE compressed dump
  * files — the format real RDF corpora actually ship in
  * (`wikidata-*.ttl.gz`, DBpedia `.nt.bz2`). Gzip has no block index:
  * Hadoop's record reader must stream one whole file on ONE task, so a
  * 100 GB dump read directly through `spark.read.text` silently loses
  * every splittability property the statement-delimited readers
  * ([[TurtleIO.turtleAudit]], [[RdfIO.ntriplesAudit]]) are built on —
  * one straggler task, executor-memory pressure, no parse fan-out.
  *
  * This step makes the cost explicit and pays it ONCE, in parallel
  * across files (one task per input file — gzip's intrinsic floor),
  * rewriting each stream into plain-text shards of ~`targetShardBytes`
  * cut ONLY at statement-terminator boundaries. Downstream readers then
  * re-split the sharded copy at the same terminator, so sharding
  * introduces ZERO tears beyond what delimited-record splitting already
  * has; a corpus of N files × K shards parses on N·K tasks.
  *
  * Scale shape:
  *  - the file list is schema-sized (a directory listing, collected
  *    once); the byte work is executor-side streaming — constant
  *    memory per task (one buffered codec stream in, one shard stream
  *    out), never a whole-file materialization;
  *  - the terminator spelling is probed per file from the first 64 KiB
  *    of DECOMPRESSED bytes (same preference order as
  *    [[TurtleIO.probeSep]]: spaced dot beats unspaced, CRLF detected),
  *    so mixed-serializer corpora shard correctly file by file;
  *  - shard writes go through the Hadoop FileSystem API — local, HDFS
  *    and object stores all work; the returned manifest is the audit
  *    relation (one row per input file: shards written, bytes out).
  *
  * Already-splittable inputs (plain text, or a future seekable-zstd /
  * bgzf codec) don't need this step — point the reader at them
  * directly; `decompressAndShard` on a plain file is a harmless
  * re-chunking copy.
  */
object CompressedIngest {

  /** Default shard size: big enough that per-file task overhead is
    * noise, small enough that a shard is one comfortable Spark
    * partition (matches `spark.sql.files.maxPartitionBytes`).
    */
  val DefaultShardBytes: Long = 128L * 1024 * 1024

  /** Decompress every file under `inPath` (glob, file or directory)
    * into plain-text shards under `outDir`, cut at statement-terminator
    * boundaries. Returns the manifest `(src, shards, bytes_out)` —
    * materialized eagerly (the shards must exist when this returns).
    */
  def decompressAndShard(spark: SparkSession, inPath: String,
      outDir: String, targetShardBytes: Long = DefaultShardBytes)
      : DataFrame = {
    import spark.implicits._
    val files = listDataFiles(spark, inPath)
    require(files.nonEmpty, s"no data files under $inPath")
    // OVERWRITE semantics, decided on the driver before the job: input
    // part-file names differ per upstream write, so a stale shard dir
    // would otherwise ACCUMULATE shards across runs — a silent 2x/3x
    // row duplication on re-ingest
    val outP = new org.apache.hadoop.fs.Path(outDir)
    outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(outP, true)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val target = math.max(targetShardBytes, 1024L)
    // one task per input file: gzip decompression cannot split, so
    // file grain IS the available parallelism of this step
    val manifest = spark.createDataset(files)
      .repartition(files.length)
      .map { src => shardOneFile(hconf.value, src, outDir, target) }
      .toDF("src", "shards", "bytes_out")
      .persist()
    manifest.count() // eager: callers read outDir right after
    manifest
  }

  /** Shard one file: stream-decompress via the Hadoop codec factory
    * (suffix-dispatched — .gz, .bz2, .deflate, .snappy; unknown
    * suffixes stream as plain bytes), cutting each shard at the first
    * terminator boundary past the size target. Byte-level terminator
    * matching is UTF-8-safe: every terminator byte is ASCII and ASCII
    * bytes never occur inside multi-byte UTF-8 sequences.
    *
    * PIPELINED (round 13): decompression (CPU) and shard writes (I/O)
    * run on separate threads joined by a bounded chunk queue, so a
    * SINGLE-file dump — the most common real download, whose intrinsic
    * parallelism floor is one decompress stream — costs
    * max(decompress, write) wall-clock instead of their sum. Memory
    * stays constant: the queue holds at most [[PipelineQueueChunks]]
    * ~1 MB chunks and `put` backpressures the decompressor when the
    * writer lags.
    */
  private[sources] val PipelineQueueChunks = 16

  private def shardOneFile(hconf: org.apache.hadoop.conf.Configuration,
      src: String, outDir: String, target: Long): (String, Int, Long) = {
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(hconf)
    val outFs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hconf)
    outFs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      hconf).getCodec(srcPath)
    val raw = fs.open(srcPath)
    val in = new java.io.BufferedInputStream(
      if (codec == null) raw else codec.createInputStream(raw),
      1 << 20)
    val baseName = {
      val n = srcPath.getName
      val stripped = Option(codec)
        .map(c => org.apache.hadoop.io.compress.CompressionCodecFactory
          .removeSuffix(n, c.getDefaultExtension))
        .getOrElse(n)
      stripped.replaceAll("[^A-Za-z0-9._-]", "_")
    }
    // writer-thread protocol: Array[Byte] = append to the current
    // shard; CUT = close it and open the next; DONE = finish
    val CUT = new Object
    val DONE = new Object
    val queue = new java.util.concurrent.ArrayBlockingQueue[AnyRef](
      PipelineQueueChunks)
    @volatile var werr: Throwable = null
    val writer = new Thread(() => {
      var out: java.io.OutputStream = null
      var idx = 0
      def openShard(): Unit = {
        out = outFs.create(new org.apache.hadoop.fs.Path(
          outDir, f"$baseName-s$idx%05d"), true)
        idx += 1
      }
      try {
        openShard()
        var ev = queue.take()
        while (ev ne DONE) {
          ev match {
            case arr: Array[Byte] => out.write(arr)
            case _ => out.close(); out = null; openShard()
          }
          ev = queue.take()
        }
      } catch {
        // exit immediately: the producer's offer-with-timeout loop
        // observes werr and aborts its own side
        case t: Throwable => werr = t
      } finally if (out != null) out.close()
    }, s"graft-shard-writer-$baseName")
    writer.setDaemon(true)
    var shardIdx = 1 // the writer opens shard 0 up front
    var bytesOut = 0L
    var shardBytes = 0L
    def put(ev: AnyRef): Unit = {
      while (!queue.offer(ev, 100,
          java.util.concurrent.TimeUnit.MILLISECONDS)) {
        if (werr != null) throw new java.io.IOException(
          s"shard writer failed for $src", werr)
      }
      if (werr != null) throw new java.io.IOException(
        s"shard writer failed for $src", werr)
    }
    try {
      writer.start()
      // probe the terminator from the decompressed head (bounded read,
      // buffered back into the stream via mark/reset)
      in.mark(65536)
      val head = new Array[Byte](65536)
      var off = 0
      var r = 0
      while (off < head.length && r >= 0) {
        r = in.read(head, off, head.length - off)
        if (r > 0) off += r
      }
      in.reset()
      val term = probeTerminator(new String(head, 0, off,
        java.nio.charset.StandardCharsets.UTF_8))
      val termBytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // stream buffer-at-a-time: copy bytes, track a rolling match
      // position against the terminator (exact for these patterns —
      // no terminator has an internal repeated prefix beyond its first
      // byte); once past the size target, cut at the next match
      var m = 0 // matched prefix length of termBytes
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        var start = 0
        while (i < n) {
          val b = buf(i)
          m = if (b == termBytes(m)) m + 1
              else if (b == termBytes(0)) 1 else 0
          i += 1
          if (m == termBytes.length) {
            m = 0
            if (shardBytes + (i - start) >= target) {
              put(java.util.Arrays.copyOfRange(buf, start, i))
              bytesOut += i - start
              put(CUT)
              shardIdx += 1
              shardBytes = 0L
              start = i
            }
          }
        }
        if (n - start > 0) {
          put(java.util.Arrays.copyOfRange(buf, start, n))
          shardBytes += n - start
          bytesOut += n - start
        }
        n = in.read(buf)
      }
      put(DONE)
      writer.join()
      if (werr != null) throw new java.io.IOException(
        s"shard writer failed for $src", werr)
    } finally {
      in.close()
      if (writer.isAlive) { queue.clear(); queue.offer(DONE); writer.join(10000) }
    }
    // an empty trailing shard (file ended exactly on a cut) is fine —
    // readers skip empty files; report the real shard count
    (src, shardIdx, bytesOut)
  }

  /** Is every data file under `path` a SPLITTABLE compressed format
    * (bzip2 — block-compressed, Hadoop's record readers split it
    * natively) or plain text? Then the shard step is unnecessary:
    * point the statement-delimited readers at the dump directly and
    * FileInputFormat fans the parse out inside each file, even a
    * single 100 GB one — the arm that lifts the gzip single-file
    * parallelism floor when the publisher ships `.bz2` (DBpedia does).
    */
  def splittable(spark: SparkSession, path: String): Boolean = {
    val factory = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      spark.sparkContext.hadoopConfiguration)
    listDataFiles(spark, path).forall { f =>
      factory.getCodec(new org.apache.hadoop.fs.Path(f)) match {
        case null => true // plain text splits natively
        case c => c.isInstanceOf[
          org.apache.hadoop.io.compress.SplittableCompressionCodec]
      }
    }
  }

  /** Resolve the path the delimited readers should parse: the dump
    * itself when [[splittable]] (zero-copy — bz2/plain fan out
    * natively), else the [[decompressAndShard]] output (the explicit
    * one-pass rewrite gzip requires).
    */
  def readablePath(spark: SparkSession, inPath: String, shardDir: String,
      targetShardBytes: Long = DefaultShardBytes): String =
    if (splittable(spark, inPath)) inPath
    else {
      decompressAndShard(spark, inPath, shardDir, targetShardBytes)
      shardDir
    }

  /** Same preference order as [[TurtleIO.probeSep]]: spaced dot beats
    * unspaced (every " .\n" contains ".\n"; the spaced split never
    * tears a sentence-final line break inside a literal), CRLF detected
    * from the head.
    */
  private def probeTerminator(head: String): String = {
    val nl = if (head.contains("\r\n")) "\r\n" else "\n"
    if (head.contains(" ." + nl)) " ." + nl
    else if (head.contains("." + nl)) "." + nl
    else " ." + nl
  }

  /** Schema-sized driver-side listing: data files under a glob, file
    * or directory (Spark's usual `_`/`.` success-marker files skipped).
    */
  private def listDataFiles(spark: SparkSession, path: String)
      : Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = Option(fs.globStatus(hp)).filter(_.nonEmpty)
      .getOrElse(Array(fs.getFileStatus(hp)))
    roots.iterator.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).iterator
      else Iterator(st)
    }.collect { case st if st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && st.getLen > 0
      } => st.getPath.toString
    }.toSeq
  }
}
