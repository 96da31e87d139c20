package graft.bgp

import graft.scale.GuardedBroadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF triple store over Spark, vertically partitioned by predicate.
  *
  * The reference keeps its triples inside the external RDF-3X binary
  * (SURVEY.md §1.1) with dictionary-encoded uint64 IDs and decodes
  * lexical values only at the result edge (Proxy.c:211-224). Here the
  * store is a map `predicate -> DataFrame(s, o)` — the classic
  * vertical-partitioning layout for SPARQL-on-relational. A pattern
  * with a constant predicate (every pattern in the reference's fixture
  * queries) touches exactly one slice, which is a narrow 2-column
  * projection of one base table: Catalyst prunes the parquet scan to
  * those columns, and at 100 TB the layout is "parquet partitioned by
  * p" — pattern dispatch IS partition pruning. No monolithic union, no
  * store-wide distinct (RDF set semantics are enforced per slice,
  * where the distinct is narrow and cheap).
  *
  *  - string form: `slices(p): (s, o: String)`;
  *  - encoded form: same slices with xxhash64 IDs + `dict(id, value)`
  *    for result-edge decode (reference parity; ~8× narrower shuffle
  *    rows). xxhash64 is deterministic and embarrassingly parallel —
  *    no global sort or zipWithIndex bottleneck at load, unlike a
  *    dense-ID dictionary build.
  */
final case class TripleStore(
    slices: Map[String, DataFrame],
    dict: Option[DataFrame],
    sBucketed: Option[DataFrame] = None,
    // the OPS-permutation secondary (the object-first index role of
    // the reference's RDF-3X backend — databases/RDFDB, Main.c:121-123
    // — whose permutation set serves constant-object lookups): the
    // same (s, o, p) rows partitioned by p but bucketed + sorted by
    // OBJECT, so a constant-object probe (?s nationkey <nation:7>,
    // every rdf:type restriction) reads one bucket of one partition
    // instead of scanning the whole predicate slice. `p` is ALWAYS
    // the string name (dispatch by name on both encodings).
    // Like sBucketed, this is a persisted-layout handle: every
    // mutation drops it (the mutated slices are the truth).
    oBucketed: Option[DataFrame] = None,
    // named graphs as a quad relation (g, s, p, o): g/s/o in store form
    // (strings, or xxhash64 ids on the encoded store), p ALWAYS the
    // string predicate name (dispatch is by name). On disk the layout
    // analog is parquet partitioned by (g, p) — a constant graph term
    // plus constant predicate is double partition pruning.
    quads: Option[DataFrame] = None,
    // ids are DENSE sequential (encodeSequential) rather than xxhash64
    // of the value: the >10⁹-term regime's escape from the birthday
    // bound. The planner then resolves each query constant with one
    // dict probe instead of hashing it (RDF-3X's discipline,
    // Proxy.c:211-224).
    sequential: Boolean = false) {

  /** Plan-time resolution cache for SEQUENTIAL-encoding query
    * constants, shared across every planner pass over THIS store
    * instance. Mutations rebuild the store through `copy`, so a grown
    * dictionary is never read through a stale entry. Primed in one
    * batched dict scan per query (`BgpPlanner.primeConsts`): a
    * 1000-constant VALUES/IN resolves with ONE Spark job instead of
    * 1000 single-row probe jobs.
    */
  private[bgp] val constCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def encoded: Boolean = dict.isDefined

  /** Union view `(s, p, o)` for variable-predicate patterns only —
    * never materialized unless such a pattern exists.
    */
  def unionView: DataFrame = {
    val pCol: String => Column =
      if (!encoded) { p => lit(p) }
      else if (!sequential) { p => xxhash64(lit(p)) }
      else {
        // dense ids are not name hashes: resolve the predicate
        // inventory's ids in ONE bounded dict scan (schema-sized — the
        // same contract as the inventory itself); an unlisted name
        // gets the never-matching id 0
        val names = slices.keySet.toSeq
        val m = dict.get.filter(col("value").isin(names: _*))
          .select(col("value"), col("id")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        p => lit(m.getOrElse(p, 0L))
      }
    slices.map { case (p, df) =>
      df.select(col("s"), pCol(p).as("p"), col("o"))
    }.reduce(_ unionByName _)
  }

  /** The scan a variable-predicate pattern dispatches to: the
    * s-bucketed secondary layout when materialized (the SOP-index
    * analog of RDF-3X's permutation indexes — a constant subject
    * prunes to one bucket instead of unioning every predicate slice),
    * else the union view.
    */
  def variableView: DataFrame = sBucketed.getOrElse(unionView)

  /** The OPS-layout view of one predicate slice, when the secondary is
    * materialized AND the predicate exists (an unknown predicate must
    * keep the empty-slice short-circuit, so absence returns None).
    */
  def oSlice(p: String): Option[DataFrame] =
    if (slices.contains(p))
      oBucketed.map(_.filter(col("p") === p).select(col("s"), col("o")))
    else None
}

object TripleStore {

  /** Derive a string-form triple store from the driver's star schema.
    * Edge inventory mirrors an RDF view of TPC-H: entity URIs like
    * `customer:17`, plus value literals. Set semantics via per-slice
    * distinct().
    */
  def fromStarSchema(spark: SparkSession, dir: String): TripleStore = {
    import graft.Tables.t
    def uri(prefix: String, c: Column) =
      concat(lit(prefix), lit(":"), c.cast("string"))

    val cust = t(spark, dir, "customer")
    val sup = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    val reg = t(spark, dir, "region")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")

    def so(df: DataFrame, s: Column, o: Column): DataFrame =
      df.select(s.as("s"), o.cast("string").as("o"))

    // third element: does the derivation already guarantee (s,o)
    // uniqueness? True for every slice projected from a keyed table
    // (one row per key ⇒ unique s; table-prefixed URIs keep unions
    // disjoint); only the lineitem-derived edges can repeat, so only
    // they pay a dedup shuffle.
    val parts: Seq[(String, DataFrame)] = Seq(
      "rdf:type" -> so(cust, uri("customer", col("c_custkey")), lit("Customer")),
      "nationkey" -> so(cust, uri("customer", col("c_custkey")), uri("nation", col("c_nationkey"))),
      "mktsegment" -> so(cust, uri("customer", col("c_custkey")), col("c_mktsegment")),
      "name" -> so(cust, uri("customer", col("c_custkey")), col("c_name")),
      "rdf:type" -> so(sup, uri("supplier", col("s_suppkey")), lit("Supplier")),
      "nationkey" -> so(sup, uri("supplier", col("s_suppkey")), uri("nation", col("s_nationkey"))),
      "name" -> so(sup, uri("supplier", col("s_suppkey")), col("s_name")),
      "rdf:type" -> so(nat, uri("nation", col("n_nationkey")), lit("Nation")),
      "name" -> so(nat, uri("nation", col("n_nationkey")), col("n_name")),
      "regionkey" -> so(nat, uri("nation", col("n_nationkey")), uri("region", col("n_regionkey"))),
      "name" -> so(reg, uri("region", col("r_regionkey")), col("r_name")),
      "rdf:type" -> so(ord, uri("order", col("o_orderkey")), lit("Order")),
      "custkey" -> so(ord, uri("order", col("o_orderkey")), uri("customer", col("o_custkey"))),
      "status" -> so(ord, uri("order", col("o_orderkey")), col("o_orderstatus")),
      "contains" -> so(li, uri("order", col("l_orderkey")), uri("part", col("l_partkey"))),
      "suppliedby" -> so(li, uri("order", col("l_orderkey")), uri("supplier", col("l_suppkey"))),
      "supplies" -> so(li, uri("supplier", col("l_suppkey")), uri("part", col("l_partkey"))),
      // temporal successor edges: each order → the customer's next
      // order by date (the one predicate with genuine multi-hop chains,
      // so p+/p*/p{n,m} path queries traverse something real)
      "nextorder" -> {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        so(ord.withColumn("__nk", lead(col("o_orderkey"), 1).over(w))
            .filter(col("__nk").isNotNull),
          uri("order", col("o_orderkey")), uri("order", col("__nk")))
      })

    val needsDedup = Set("contains", "suppliedby", "supplies")
    val slices = parts.groupBy(_._1).map { case (p, xs) =>
      val u = xs.map(_._2).reduce(_ unionByName _)
      p -> (if (needsDedup(p)) u.distinct() else u)
    }
    TripleStore(slices, None)
  }

  /** Hard cap on the predicate inventory: vertical partitioning
    * assumes predicates are schema-sized, not data-sized. Past the cap
    * the build fails loudly instead of collecting an unbounded set to
    * the driver.
    */
  val MaxPredicates = 10000

  /** Build a store from a generic `(s, p, o)` string DataFrame (e.g.
    * an N-Triples load). The predicate inventory is schema-sized, not
    * data-sized, so the distinct-predicate collect is a metadata
    * operation — the same assumption vertical partitioning always
    * makes, enforced by [[MaxPredicates]]: the collect is limit-bounded
    * and over-cap input is an error, never an unbounded driver set.
    */
  /** Persisted-source memo for [[fromTriples]]. Every WITH/USING
    * update op rebuilds a scoped store, and registry/server/test
    * stores route through fromTriples too — an unconditional persist
    * would pin one cache block per call for the session lifetime.
    * Keyed by the canonicalized source plan plus output column names
    * (the [[graft.scale.GuardedBroadcast]] discipline: canonicalization
    * normalizes aliases away, and two renamings of the same relation
    * must not share a handle), so rebuilding the same scoped view
    * reuses the persisted handle and LRU eviction unpersists the
    * displaced one instead of leaking it.
    *
    * Same-path reload semantics: a FILE-BACKED plan's canonicalized
    * form snapshots the file listing at read time, so re-reading a
    * path after its files were overwritten produces a NEW key and a
    * fresh scan (ScaleSpec pins this — no stale serve). Staleness is
    * only possible when the caller re-submits the IDENTICAL plan
    * (same DataFrame / same file snapshot), where returning the
    * persisted rows is the memo working as designed. For explicit
    * lifecycle control (long sessions, bulk unpersist),
    * [[invalidateSourceCache]] drops the whole memo.
    */
  private val sourceMemo = new graft.tools.BoundedMemo[
      (SparkSession, Seq[String],
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      DataFrame](16, _.unpersist())

  /** Invalidate every memoized [[fromTriples]] source persist — the
    * refresh hook for same-path reloads (files overwritten behind a
    * previously loaded plan). Unpersists each displaced handle.
    */
  def invalidateSourceCache(): Unit = sourceMemo.clear()

  def fromTriples(df0: DataFrame): TripleStore = {
    // persist the source ONCE per distinct plan (via [[sourceMemo]]):
    // every slice below derives by filter+distinct from it, so without
    // the cache a k-slice query re-scans (and for an N-Triples load,
    // re-parses) the raw relation k times per action. MEMORY_AND_DISK —
    // the predicate-inventory collect right after materializes it.
    // Stores past fixture/load scale belong on the persisted layouts
    // ([[writePartitioned]] / [[fromPartitionedParquet]]), where slice
    // dispatch is partition pruning and nothing needs executor memory.
    val df = sourceMemo.getOrElseUpdate(
      (df0.sparkSession, df0.columns.toIndexedSeq,
        df0.queryExecution.analyzed.canonicalized),
      df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val preds = df.select(col("p")).distinct().limit(MaxPredicates + 1)
      .collect().map(_.getString(0))
    require(preds.length <= MaxPredicates,
      s"more than $MaxPredicates distinct predicates: this data is not " +
        "vertically partitionable by predicate — use the p-partitioned " +
        "parquet layout and a predicate column instead")
    val slices = preds.map { p =>
      p -> df.filter(col("p") === p).select(col("s"), col("o")).distinct()
    }.toMap
    TripleStore(slices, None)
  }

  /** Persist a string-form store as parquet partitioned by predicate —
    * the on-disk layout of the vertical partitioning: one directory
    * per `p=...`, so a constant-predicate pattern scan is answered by
    * partition pruning (see [[fromPartitionedParquet]]).
    */
  def writePartitioned(store: TripleStore, path: String): Unit =
    store.unionView.write.mode("overwrite").partitionBy("p").parquet(path)

  /** Persist a store's whole DATASET: the default graph under
    * `<path>/default` (p-partitioned — [[writePartitioned]]) and the
    * named-graph quads under `<path>/quads`, parquet partitioned by
    * `(g, p)` — the on-disk analog the quads relation's scaladoc
    * promises: a GRAPH block with a constant graph term and constant
    * predicate is DOUBLE partition pruning (one `g=...`/`p=...`
    * directory), a variable-predicate dump of one graph prunes to its
    * `g=...` subtree, and graph management ops (DROP/ADD/COPY/MOVE)
    * move directory subtrees, not rows.
    */
  def writeDataset(store: TripleStore, path: String): Unit = {
    // encoded stores persist in ID SPACE: slices keep the predicate's
    // STRING name as the partition key (dispatch stays name-keyed and
    // pruned) while s/o carry BIGINT ids, and the dictionary lands
    // beside them under <path>/dict — the >10⁹-term regime's layout,
    // where a full string rewrite per op would be fatal. The id regime
    // (hash vs sequential) is re-detected from the dict on reload
    // ([[isSequentialDict]]), so no extra marker file is needed.
    if (store.encoded) {
      writeEncodedPartitioned(store, s"$path/default")
      store.dict.foreach(_.select(col("id"), col("value"), col("dt"),
          col("lang"))
        .write.mode("overwrite").parquet(s"$path/dict"))
    } else writePartitioned(store, s"$path/default")
    // an all-empty quads relation writes NO subtree (a partitioned
    // parquet dir with zero partition dirs has no inferable schema on
    // reload; an empty graph set and an absent one are the same thing)
    store.quads.filter(q => !q.isEmpty).foreach(q =>
      q.select(col("s"), col("o"), col("g"), col("p"))
        .write.mode("overwrite").partitionBy("g", "p")
        .parquet(s"$path/quads"))
  }

  /** Row-grain delta of ONE update op against the store it was applied
    * to, in store (string) form. `default` rows are `(p, s, o, del)`,
    * `quads` rows `(g, p, s, o, del)` — `del = true` tombstones,
    * `del = false` inserts; within one op an insert beats a tombstone
    * of the same row (SPARQL §3.1.3 delete-then-insert). `structural`
    * marks ops whose effect is not row-grain (CLEAR / DROP / LOAD /
    * graph management): the write-back checkpoints a full new dataset
    * version for those instead of appending a delta batch.
    */
  final case class OpDelta(
      default: Option[DataFrame],
      quads: Option[DataFrame],
      structural: Boolean,
      // dictionary growth of this op (encoded stores): genuinely-new
      // (id, value, dt, lang) rows — dict rows are append-only, so the
      // delta log needs no tombstones for them
      dictRows: Option[DataFrame] = None)

  /** Delta batches a dataset version absorbs before the write-back
    * compacts them into a fresh full version (the lakehouse
    * log-then-compact move; threshold keeps read-time merge cost and
    * delta-file counts bounded).
    */
  val CompactDeltaBatches = 16

  /** Versions retained after a pointer flip: the NEW version plus one
    * predecessor, so readers that loaded before the flip finish their
    * scans on intact files (one full compaction cycle of slack —
    * CompactDeltaBatches row-grain ops, or one structural op).
    */
  val KeepVersions = 2

  private def fsPath(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def sparkOf(st: TripleStore): SparkSession =
    st.slices.values.headOption.orElse(st.quads).orElse(st.dict)
      .map(_.sparkSession)
      .getOrElse(throw new IllegalArgumentException("empty store"))

  /** The dataset's current version number, if `path` is a versioned
    * root (has a `VERSION` pointer file).
    */
  def currentVersion(spark: SparkSession, path: String): Option[Int] = {
    val (fs, _) = fsPath(spark, path)
    val vp = new org.apache.hadoop.fs.Path(s"$path/VERSION")
    if (!fs.exists(vp)) None
    else {
      val in = fs.open(vp)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Versions of the dataset at `path` still on disk, ascending —
    * the current version plus up to [[KeepVersions]]-1 retained
    * predecessors. Each is readable via the version-pinned
    * [[fromDatasetParquet]] until [[writeDatasetVersioned]]
    * garbage-collects it. One filesystem listing; no data read.
    */
  def listVersions(spark: SparkSession, path: String): Seq[Int] = {
    val (fs, p) = fsPath(spark, path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("v"))
        scala.util.Try(n.drop(1).toInt).toOption
      else None
    }.sorted
  }

  /** Resolve the CURRENT version root of the dataset at `path`: the
    * `v<n>` subdirectory the `VERSION` pointer names, or `path` itself
    * for a legacy (unversioned) [[writeDataset]] layout. Everything
    * under one version root is immutable-except-append (delta batches
    * only ever ADD `seq=` directories), so a store loaded from a
    * resolved root keeps reading intact files across later write-backs
    * until its version is garbage-collected ([[KeepVersions]]).
    */
  def datasetRoot(spark: SparkSession, path: String): String =
    currentVersion(spark, path).map(n => s"$path/v$n").getOrElse(path)

  /** Write `store` as the NEXT full version of the dataset at `path`
    * and flip the `VERSION` pointer: `<path>/v<n>/{default,quads}` in
    * the [[writeDataset]] layout, pointer updated via tmp-file +
    * rename, versions older than [[KeepVersions]] garbage-collected.
    * Readers pinned to the previous version finish undisturbed; a
    * legacy unversioned layout at `path` is retired (its dirs deleted)
    * once the SECOND version lands — until then it plays the role of
    * the previous version.
    */
  def writeDatasetVersioned(store: TripleStore, path: String): Unit = {
    val spark = sparkOf(store)
    val (fs, _) = fsPath(spark, path)
    val n = currentVersion(spark, path).map(_ + 1).getOrElse(0)
    // multi-writer guard (a batch job beside a served endpoint is the
    // normal lakehouse shape): the v<n> directory is CLAIMED with a
    // create-exclusive file before anything writes — the losing JVM
    // fails loudly here instead of interleaving files with the winner
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    require(claimExclusive(fs,
        new org.apache.hadoop.fs.Path(s"$path/v$n.claim")),
      s"version v$n of $path is already claimed by a concurrent " +
        "writer — reload the dataset and retry this write")
    writeDataset(store, s"$path/v$n")
    // conditional flip: by claim order the pointer must still read
    // n-1 (or be absent for the bootstrap) — a moved pointer means a
    // lost race, and clobbering it would orphan the winner's version
    val cur = currentVersion(spark, path)
    require(cur.forall(_ == n - 1),
      s"VERSION pointer at $path moved to $cur while writing v$n — " +
        "a concurrent writer won the race; this write is aborted")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.VERSION.tmp")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val vp = new org.apache.hadoop.fs.Path(s"$path/VERSION")
    fs.delete(vp, false)
    require(fs.rename(tmp, vp), s"VERSION pointer flip to $n failed")
    (0 to n - KeepVersions).foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$m"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$m.claim"), false)
    }
    if (n >= KeepVersions - 1 && n >= 1)
      Seq("default", "quads", "delta", "dict").foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
  }

  /** Create-exclusive claim: atomically wins or returns false. HDFS
    * and the local FS both fail `create(path, overwrite=false)` when
    * the file exists, so two JVMs can never both win one slot.
    */
  private def claimExclusive(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    try { fs.create(p, false).close(); true }
    catch { case _: java.io.IOException => false }

  private def nextDeltaSeq(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Int = {
    def maxIn(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) -1
      else fs.listStatus(p).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("seq=")) scala.util.Try(n.drop(4).toInt).toOption
        else None
      }.foldLeft(-1)(math.max)
    }
    Seq(s"$root/delta/default", s"$root/delta/quads", s"$root/delta/dict")
      .map(maxIn).max + 1
  }

  private def writeDeltaBatch(rows: DataFrame, dir: String, seq: Int,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.tmp-$seq")
    // one file per batch: deltas are op-grain (a protocol update's
    // rows), so a multi-MB-task fan-out only pads the log with empty
    // part files; corpus-scale rewrites belong to LOAD/structural ops
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val target = new org.apache.hadoop.fs.Path(s"$dir/seq=$seq")
    fs.delete(target, true)
    require(fs.rename(tmp, target), s"delta batch commit $target failed")
  }

  /** DELTA-GRAIN write-back of one update chain into the dataset at
    * `path`: each row-grain op APPENDS its insert/tombstone rows as a
    * parquet delta batch under the current version root
    * (`delta/default/seq=<k>`, `delta/quads/seq=<k>`) — bytes written
    * scale with the op's DELTA rows, never with the size of a touched
    * slice. At 100 TB this is the difference that keeps a served
    * endpoint alive: one inserted `rdf:type` triple writes one
    * kilobyte-scale delta file instead of rewriting the corpus's
    * hottest predicate slice. [[fromDatasetParquet]] merges the delta
    * log back at read time (latest op wins per row); past
    * [[CompactDeltaBatches]] batches the write-back compacts the
    * merged store into a fresh full version
    * ([[writeDatasetVersioned]]) and the log resets.
    *
    * Structural ops (CLEAR/DROP/LOAD/graph management — not row-grain)
    * checkpoint a full new version immediately. Version flips never
    * touch the previous version's files ([[KeepVersions]]), so
    * readers loaded before the flip keep a consistent snapshot.
    *
    * `next` must be `prev` with exactly `deltas`' ops applied —
    * [[graft.bgp.SparqlUpdate.applyAllWithDelta]] produces the pair.
    * ENCODED stores persist id-space delta rows under the encoded
    * [[writeDataset]] layout, with each op's dictionary growth
    * appended as `delta/dict/seq=` batches (audited, batch-scoped —
    * [[hashDictDelta]]/[[sequentialDictDelta]]); dict rows land FIRST
    * within an op so a torn write can only leave extra vocabulary,
    * never dangling ids.
    */
  def writeBackDelta(prev: TripleStore, next: TripleStore, path: String,
      deltas: Seq[OpDelta]): Unit = {
    val spark =
      try sparkOf(next) catch { case _: IllegalArgumentException => sparkOf(prev) }
    val (fs, _) = fsPath(spark, path)
    val hasLayout = currentVersion(spark, path).isDefined ||
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/default"))
    if (!hasLayout || deltas.exists(_.structural)) {
      // bootstrap, or a structural op: checkpoint a full new version
      writeDatasetVersioned(next, path)
      return
    }
    val root = datasetRoot(spark, path)
    var seq = nextDeltaSeq(fs, root)
    deltas.foreach { d =>
      if (d.default.nonEmpty || d.quads.nonEmpty || d.dictRows.nonEmpty) {
        // CAS-shaped sequence reservation: claim `seq=<k>.lock`
        // create-exclusively, walking forward past slots another
        // writer claimed — two JVMs appending to one dataset can
        // interleave batches but never clobber one (the read-then-
        // write hole the bare counter had)
        var tries = 0
        while (!claimExclusive(fs, new org.apache.hadoop.fs.Path(
            s"$root/delta/seq=$seq.lock"))) {
          seq += 1
          tries += 1
          require(tries < 10000,
            s"could not reserve a delta sequence slot under $root")
        }
        d.dictRows.foreach(rows => writeDeltaBatch(
          rows.select(col("id"), col("value"), col("dt"), col("lang")),
          s"$root/delta/dict", seq, fs))
        d.default.foreach(rows => writeDeltaBatch(
          rows.select(col("p"), col("s"), col("o"), col("del")),
          s"$root/delta/default", seq, fs))
        d.quads.foreach(rows => writeDeltaBatch(
          rows.select(col("g"), col("p"), col("s"), col("o"), col("del")),
          s"$root/delta/quads", seq, fs))
        seq += 1
      }
    }
    if (seq >= CompactDeltaBatches) writeDatasetVersioned(next, path)
  }

  /** Diff-derived write-back for callers without op introspection:
    * row-grain deltas are computed by anti-joining `prev` against
    * `next` per TOUCHED slice (reference inequality is the touched
    * set — updates are functional maps over the immutable store, so
    * an untouched predicate keeps its exact DataFrame object). Bytes
    * WRITTEN scale with the delta; compute scales with the touched
    * slices (two anti-joins each). The op-introspected overload
    * ([[graft.bgp.SparqlUpdate.applyAllWithDelta]]) avoids even that
    * scan for data ops — prefer it on served endpoints.
    */
  def writeBackDelta(prev: TripleStore, next: TripleStore,
      path: String): Unit = {
    def withP(p: String, df: DataFrame, del: Boolean): DataFrame =
      df.select(lit(p).as("p"), col("s"), col("o"), lit(del).as("del"))
    val changed = next.slices.filter { case (p, df) =>
      !prev.slices.get(p).exists(_ eq df)
    }
    val removed = prev.slices.keySet -- next.slices.keySet
    val defaultParts: Seq[DataFrame] =
      changed.toSeq.flatMap { case (p, df) =>
        val base = prev.slices.get(p)
        val ins = base.map(b => df.join(b, Seq("s", "o"), "left_anti"))
          .getOrElse(df)
        val del = base.map(b => b.join(df, Seq("s", "o"), "left_anti"))
        withP(p, ins, del = false) +: del.map(withP(p, _, del = true)).toSeq
      } ++ removed.toSeq.map(p => withP(p, prev.slices(p), del = true))
    val qCols = Seq("g", "p", "s", "o")
    def q4(df: DataFrame, del: Boolean): DataFrame =
      df.select((qCols.map(col) :+ lit(del).as("del")): _*)
    val quadsDelta: Option[DataFrame] = (prev.quads, next.quads) match {
      case (Some(a), Some(b)) if a eq b => None
      case (None, None) => None
      case (Some(a), Some(b)) =>
        Some(q4(b.join(a, qCols, "left_anti"), del = false)
          .unionByName(q4(a.join(b, qCols, "left_anti"), del = true)))
      case (None, Some(b)) => Some(q4(b, del = false))
      case (Some(a), None) => Some(q4(a, del = true))
    }
    val defaultDelta = defaultParts.reduceOption(_ unionByName _)
    // dict growth without op introspection: when the dict object moved,
    // diff it by id (vocabulary-sized anti-join — the op-introspected
    // overload avoids this scan; prefer it on served endpoints)
    val dictDelta: Option[DataFrame] = (prev.dict, next.dict) match {
      case (Some(a), Some(b)) if !(a eq b) =>
        Some(b.join(a.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("value"), col("dt"), col("lang")))
      case _ => None
    }
    if (defaultDelta.isEmpty && quadsDelta.isEmpty && dictDelta.isEmpty)
      // nothing changed — the overload still bootstraps an absent layout
      writeBackDelta(prev, next, path, Seq.empty)
    else writeBackDelta(prev, next, path,
      Seq(OpDelta(defaultDelta, quadsDelta, structural = false,
        dictRows = dictDelta)))
  }

  /** Truncate the store's logical-plan LINEAGE (localCheckpoint on
    * every slice, the quads relation, and the dict): a long-lived
    * served endpoint applying thousands of functional updates
    * otherwise accumulates unbounded plan depth — each op wraps the
    * previous plan in a union/anti-join, so planning cost and driver
    * plan memory grow per op even though the DATA stays small. The
    * checkpoint replaces each plan with a depth-1 scan of its
    * materialized RDD (lazy — no job storm over a wide predicate
    * inventory; each slice materializes on first use). This is the
    * in-memory analog of the [[writeBackDelta]] + [[fromDatasetParquet]]
    * loop for endpoints serving without a persist directory.
    */
  def truncateLineage(st: TripleStore): TripleStore =
    st.copy(
      slices = st.slices.map { case (p, df) =>
        p -> df.localCheckpoint(eager = false)
      },
      dict = st.dict.map(_.localCheckpoint(eager = false)),
      quads = st.quads.map(_.localCheckpoint(eager = false)))

  /** Latest-op-wins row verdicts over a delta log directory: weight
    * `seq * 2 + (insert ? 1 : 0)` — a key's max weight is odd iff the
    * LAST batch touching it leaves it present (within one batch an
    * insert beats a tombstone of the same row, §3.1.3
    * delete-then-insert). Delta logs are op-sized and bounded by
    * [[CompactDeltaBatches]]; the lineage is truncated
    * (localCheckpoint, ContextCleaner-reclaimed) so the per-slice
    * merge joins reuse one materialization instead of re-aggregating
    * the log per action.
    */
  private def deltaVerdict(spark: SparkSession, deltaPath: String,
      keys: Seq[String], maxOps: Option[Int] = None): Option[DataFrame] = {
    val (fs, p) = fsPath(spark, deltaPath)
    if (!fs.exists(p) ||
        !fs.listStatus(p).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("seq=")) ||
        maxOps.exists(_ <= 0))
      None
    else {
      // seq is the partition-discovered batch directory — a maxOps
      // bound is partition PRUNING, later batches' files never open
      val log = spark.read.parquet(deltaPath)
      val bounded = maxOps.map(k => log.filter(col("seq") < k)).getOrElse(log)
      Some(bounded
        .groupBy(keys.map(col): _*)
        .agg(max(col("seq").cast("long") * 2 +
          when(!col("del"), 1).otherwise(0)).as("__w"))
        .localCheckpoint(eager = false))
    }
  }

  /** Load a dataset at `path`: resolves the current version root
    * ([[datasetRoot]]), reads the base layout — the default graph's
    * slices dispatch by partition pruning, and GRAPH blocks filter the
    * quads relation on its `(g, p)` partition columns, Catalyst turns
    * both into `PartitionFilters` (ScaleSpec asserts the pruned scan) —
    * and merges any pending delta log on top: per slice,
    * `base ANTI touched ∪ alive` with the touched set
    * guarded-broadcast (delta-sized by construction), so the base scan
    * keeps its pruning and the merge never shuffles the base.
    */
  def fromDatasetParquet(spark: SparkSession, path: String): TripleStore =
    loadVersionRoot(spark, datasetRoot(spark, path), None)

  /** TIME-TRAVEL load: the dataset at `path` as it stood while
    * retained `version` was current — the version's base checkpoint
    * merged with its own delta log, or only the FIRST `maxOps` delta
    * batches of it for op-grain history within the version (the log's
    * `seq=` partitioning makes the bound partition pruning — later
    * batches' files never open). `maxOps = Some(0)` is the bare
    * checkpoint state at the version flip. Versions are readable
    * while [[listVersions]] shows them ([[KeepVersions]] retention);
    * a garbage-collected version fails loudly here rather than
    * returning a partial store.
    */
  def fromDatasetParquet(spark: SparkSession, path: String, version: Int,
      maxOps: Option[Int] = None): TripleStore = {
    val avail = listVersions(spark, path)
    require(avail.contains(version),
      s"version $version of $path is not retained (available: " +
        s"${avail.mkString(", ")})")
    loadVersionRoot(spark, s"$path/v$version", maxOps)
  }

  private def loadVersionRoot(spark: SparkSession, root: String,
      maxOps: Option[Int]): TripleStore = {
    val st0 = fromPartitionedParquet(spark, s"$root/default")
    val st = deltaVerdict(spark, s"$root/delta/default",
        Seq("p", "s", "o"), maxOps) match {
      case None => st0
      case Some(v) =>
        val deltaPreds = v.select(col("p")).distinct()
          .limit(MaxPredicates + 1).collect().map(_.getString(0))
        require(deltaPreds.length <= MaxPredicates,
          s"delta log touches more than $MaxPredicates predicates")
        // merge ONLY the predicates the log touches: an untouched
        // slice keeps its bare pruned scan — no anti-join, no
        // broadcast job — so a 1-predicate delta adds merge cost to
        // exactly one slice, not to every plan that reads the store
        val merged = deltaPreds.toSeq.map { p =>
          val touched = v.filter(col("p") === p)
          val alive = touched.filter(col("__w") % 2 === 1)
            .select(col("s"), col("o"))
          val base = st0.slices.get(p).map(_.join(
            GuardedBroadcast.maybe(touched.select(col("s"), col("o"))),
            Seq("s", "o"), "left_anti"))
          p -> base.map(_.unionByName(alive)).getOrElse(alive)
        }.toMap
        st0.copy(slices = st0.slices ++ merged)
    }
    // encoded datasets carry their dictionary beside the slices: base
    // dict ∪ appended delta/dict batches (dict rows are append-only,
    // so the merge is a union, never a verdict); the id regime is
    // re-detected from the loaded rows
    val (dfs, dictPath) = fsPath(spark, s"$root/dict")
    val dict: Option[DataFrame] =
      if (dfs.exists(dictPath)) {
        val cols = Seq("id", "value", "dt", "lang")
        val base = spark.read.parquet(s"$root/dict")
          .select(cols.map(col): _*)
        val dd = new org.apache.hadoop.fs.Path(s"$root/delta/dict")
        val merged =
          if (dfs.exists(dd) && dfs.listStatus(dd).exists(s0 =>
              s0.isDirectory && s0.getPath.getName.startsWith("seq=")) &&
              !maxOps.exists(_ <= 0)) {
            // the op-grain pin bounds the DICT too (partition pruning
            // on the discovered seq= column, like the triple deltas):
            // a version pinned at maxOps=k must not carry vocabulary
            // appended by later ops — the loaded dict always agrees
            // with the triples it describes
            val log = spark.read.parquet(s"$root/delta/dict")
            val bounded =
              maxOps.map(k => log.filter(col("seq") < k)).getOrElse(log)
            base.unionByName(bounded.select(cols.map(col): _*))
          } else base
        Some(merged.localCheckpoint(eager = false))
      } else None
    val (fs, quadPath) = fsPath(spark, s"$root/quads")
    val quadBase =
      if (fs.exists(quadPath) &&
          fs.listStatus(quadPath).exists(_.isDirectory))
        Some(spark.read.parquet(s"$root/quads")
          // partition-column type inference reads an id-space graph
          // label as int where every value happens to fit — normalize
          // to the encoded store's BIGINT id type
          .select((if (dict.isDefined) col("g").cast("long") else col("g"))
            .as("g"), col("s"), col("p"), col("o")))
      else None
    val qCols = Seq("g", "p", "s", "o")
    val quads = deltaVerdict(spark, s"$root/delta/quads", qCols,
        maxOps) match {
      case None => quadBase
      case Some(v) =>
        val alive = v.filter(col("__w") % 2 === 1)
          .select(col("g"), col("s"), col("p"), col("o"))
        val base = quadBase.map(_.join(
          GuardedBroadcast.maybe(v.select(qCols.map(col): _*)),
          qCols, "left_anti"))
        Some(base.map(_.unionByName(alive)).getOrElse(alive))
    }
    st.copy(quads = quads, dict = dict,
      sequential = dict.exists(isSequentialDict))
  }

  /** Load a store from the partitioned layout. The predicate inventory
    * IS the partition-directory listing — one filesystem metadata read,
    * no parquet data scanned (ScaleSpec asserts zero records read) —
    * and each slice is a filter on the partition column that Catalyst
    * turns into `PartitionFilters` on the scan: touching one predicate
    * reads one directory. Predicate names round-trip through Hive-style
    * path escaping (`rdf:type` ↔ `p=rdf%3Atype`).
    */
  def fromPartitionedParquet(spark: SparkSession, path: String): TripleStore = {
    val preds = listPredicatePartitions(spark, path)
    val df = spark.read.parquet(path)
    val slices = preds.map { p =>
      p -> df.filter(col("p") === p).select(col("s"), col("o"))
    }.toMap
    TripleStore(slices, None)
  }

  /** Predicate inventory of a p-partitioned layout: the partition-
    * directory listing — one filesystem metadata read, no parquet data
    * scanned. Names round-trip Hive path escaping
    * (`rdf:type` ↔ `p=rdf%3Atype`).
    */
  private def listPredicatePartitions(
      spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val preds = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("p="))
      .map(st => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(st.getPath.getName.stripPrefix("p=")))
    require(preds.nonEmpty, s"no p=... partition directories under $path")
    require(preds.length <= MaxPredicates,
      s"more than $MaxPredicates predicate partitions under $path")
    preds
  }

  /** Persist a store as the PRIMARY at-scale layout: a catalog table
    * partitioned by predicate AND hash-bucketed + sorted by subject.
    * This is one layout carrying both of RDF-3X's access-path roles:
    *
    *  - a constant-predicate pattern prunes to one `p=...` partition
    *    directory (the POS analog — `PartitionFilters` on the scan);
    *  - two such scans joined on their subjects are co-partitioned
    *    (`HashPartitioning(s, buckets)` from the bucket spec) AND
    *    per-bucket sorted, so the subject–subject joins that dominate
    *    BGP shapes (stars, the triangle's `?o` chain) run with ZERO
    *    exchange and zero sort — at 100 TB the shuffle of two
    *    data-sized relations is the bottleneck this removes;
    *  - a constant-subject variable-predicate probe prunes to one
    *    bucket per partition (the SOP analog, `SelectedBucketsCount`).
    *
    * The pre-write `repartition(buckets, s)` uses the same
    * `pmod(murmur3(s), buckets)` function as the bucket spec, so each
    * writer task holds exactly one bucket's rows → ONE file per
    * (partition, bucket), which is what lets the scan report
    * per-bucket sortedness (multi-file buckets lose `outputOrdering`).
    * Encoded stores write the same shape with BIGINT s/o; partition
    * directories always carry the STRING predicate name (dispatch is
    * by name on every store form).
    */
  def writePartitionedBucketed(store: TripleStore, path: String,
      table: String, buckets: Int = DefaultBuckets,
      bucketCol: String = "s"): Unit = {
    val spark = store.slices.values.head.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    store.slices.map { case (p, df) =>
      df.select(col("s"), col("o"), lit(p).as("p"))
    }.reduce(_ unionByName _)
      .repartition(buckets, col(bucketCol))
      .write.mode("overwrite")
      .partitionBy("p")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Default bucket count for the primary layout — matches the local
    * harness's cores/shuffle partitions; on a real cluster size it to
    * the target parallelism (buckets are the join parallelism for the
    * exchange-free path).
    */
  val DefaultBuckets = 32

  /** Re-register a persisted partitioned+bucketed primary layout in
    * this session's catalog (bucket + partition metadata is catalog
    * state, not file state; `MSCK REPAIR` re-discovers the partition
    * directories) and return the bucket-aware table.
    */
  def registerPartitionedBucketed(spark: SparkSession, path: String,
      table: String, buckets: Int = DefaultBuckets,
      idType: String = "STRING", bucketCol: String = "s"): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      spark.sql(
        s"""CREATE TABLE $table (s $idType, o $idType, p STRING)
           |USING parquet
           |PARTITIONED BY (p)
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
      spark.sql(s"MSCK REPAIR TABLE $table")
    }
    spark.table(table)
  }

  /** Load a store from the primary partitioned+bucketed layout. Each
    * slice is a partition-pruned, bucket-aware scan of the table, and
    * BOTH forms expose the table as the variable-predicate view:
    *
    *  - string store: `p` is the partition name itself;
    *  - encoded store: `p` maps through `xxhash64(p)` — the same id
    *    the union view derives (persisted encoded stores are hash-id
    *    by construction; sequential stores are in-memory and never
    *    load through here). The hash is a deterministic expression
    *    over a PARTITION column, so the planner's `p = <id>` /
    *    `p != <id>` comparisons still prune whole directories, and
    *    constant-subject probes keep `SelectedBucketsCount: 1`.
    */
  def fromBucketedTable(spark: SparkSession, path: String, table: String,
      buckets: Int = DefaultBuckets, idType: String = "STRING"): TripleStore = {
    val preds = listPredicatePartitions(spark, path)
    val t = registerPartitionedBucketed(spark, path, table, buckets, idType)
    val slices = preds.map { p =>
      p -> t.filter(col("p") === p).select(col("s"), col("o"))
    }.toMap
    TripleStore(slices, None,
      sBucketed =
        if (idType == "STRING") Some(t)
        else Some(t.select(col("s"), xxhash64(col("p")).as("p"), col("o"))))
  }

  /** Persist the s-bucketed secondary layout (the SOP-index analog):
    * one parquet table of all triples, hash-bucketed and sorted by
    * subject. A `?s`-constant variable-predicate pattern then reads one
    * bucket (`SelectedBucketsCount: 1 out of N` in the scan), and a
    * join on `s` against another s-bucketed relation needs no
    * exchange. Bucketing metadata lives in the session catalog, so the
    * table is (re-)registered via DDL against the same files on each
    * new session — see [[registerSBucketed]].
    */
  def writeSBucketed(store: TripleStore, path: String, table: String,
      buckets: Int = 16): Unit = {
    val spark = store.slices.values.head.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    store.unionView.write.mode("overwrite")
      .bucketBy(buckets, "s").sortBy("s")
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Re-register an existing s-bucketed layout in this session's
    * catalog (bucket metadata is catalog state, not file state) and
    * return the bucket-aware DataFrame.
    */
  def registerSBucketed(spark: SparkSession, path: String, table: String,
      buckets: Int = 16): DataFrame = {
    if (!spark.catalog.tableExists(table))
      spark.sql(
        s"""CREATE TABLE $table (s STRING, p STRING, o STRING)
           |USING parquet
           |CLUSTERED BY (s) SORTED BY (s) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }

  /** Persist the dictionary as an id-bucketed, id-sorted parquet table
    * (SCALE.md: the single-pass unpivot decode joins on `id`; when the
    * result side is too large to broadcast, the dict side is already
    * hash-partitioned by the join key and needs no exchange).
    */
  def writeDict(dict: DataFrame, path: String, table: String,
      buckets: Int = 16): Unit = {
    val spark = dict.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    dict.write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Re-register a persisted dictionary in this session's catalog. */
  def registerDict(spark: SparkSession, path: String, table: String,
      buckets: Int = 16): DataFrame = {
    if (!spark.catalog.tableExists(table))
      spark.sql(
        s"""CREATE TABLE $table (id BIGINT, value STRING,
           |  dt STRING, lang STRING)
           |USING parquet
           |CLUSTERED BY (id) SORTED BY (id) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }

  /** Persist an encoded store's slices as p-partitioned parquet —
    * partition directories keep the predicate's STRING name (the slice
    * map key) while s/o carry xxhash64 ids.
    */
  def writeEncodedPartitioned(enc: TripleStore, path: String): Unit =
    enc.slices.map { case (p, df) =>
      df.select(col("s"), lit(p).as("p"), col("o"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").partitionBy("p").parquet(path)

  /** Dictionary-encode a string-form store: slice values → xxhash64
    * IDs, dict → (id, value, dt, lang) over the union of all s/o
    * positions — one distinct over the data, no driver collect. The
    * `dt`/`lang` columns are the RDF 1.1 datatype/language METADATA of
    * each value, derived once from its canonical spelling
    * ([[graft.bgp.RdfLex]]), so typed-value filters on the encoded
    * store are plain column predicates during the dict scan.
    *
    * == Id-collision safety ==
    * Hash ids (rather than RDF-3X's sequential dictionary, the
    * reference's delegate — `Proxy.c:211-224`) keep the planner able
    * to RE-DERIVE a constant's id without a dictionary join
    * (BgpPlanner hashes query constants directly). The price is the
    * 64-bit birthday bound: past ~10⁹ distinct terms a silent
    * collision — two terms joining as one — becomes plausible
    * (p ≈ n²/2⁶⁵; ~5% at 5·10⁹ terms). So `encode` AUDITS: one
    * vocabulary-sized `groupBy(id)` over the dict it just built, run
    * eagerly at store-build time, fails loudly with the colliding
    * lexical forms instead of returning a store that silently merges
    * terms. The documented escape for the >10⁹-term regime is a true
    * sequential dictionary (dense ids from a ranked dict build) —
    * that swaps the planner's hash-a-constant shortcut for one
    * broadcast dict lookup per query constant, which is exactly what
    * RDF-3X does; the audit is what tells an operator the swap is
    * due. `term2id` is overridable for tests to inject synthetic
    * collisions and pin the failure mode.
    */
  def encode(
      store: TripleStore,
      term2id: Column => Column = xxhash64(_)): TripleStore = {
    val spark = store.slices.values.head.sparkSession
    import spark.implicits._
    // predicate names participate too: a variable at the p position
    // binds an encoded predicate that must decode at the result edge
    val predNames = store.slices.keySet.toSeq.toDF("value")
    val dict = (store.slices.values.toSeq
      .flatMap(df => Seq(df.select(col("s").as("value")), df.select(col("o").as("value"))))
      :+ predNames)
      .reduce(_ unionByName _)
      .distinct()
      .select(term2id(col("value")).as("id"), col("value"),
        RdfLex.datatype(col("value")).as("dt"),
        RdfLex.lang(col("value")).as("lang"))
    // build-time collision audit (see scaladoc): distinct values
    // sharing an id would silently join as one term downstream.
    val clashes = dict.groupBy(col("id"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("a"), max(col("value")).as("b"))
      .filter(col("n") > 1)
      .take(3)
    if (clashes.nonEmpty) {
      val ex = clashes.map(r => s"id=${r.get(0)}: " +
        s"'${r.getString(2)}' vs '${r.getString(3)}'").mkString("; ")
      throw new IllegalStateException(
        "dictionary id collision — distinct RDF terms map to one id " +
          s"and would silently join as one ($ex). The hash-id encoding " +
          "has hit its birthday bound; rebuild this store with a " +
          "sequential dictionary (see TripleStore.encode scaladoc).")
    }
    val enc = store.slices.map { case (p, df) =>
      p -> df.select(term2id(col("s")).as("s"), term2id(col("o")).as("o"))
    }
    TripleStore(enc, Some(dict))
  }

  /** Delta-scoped hash-dict growth: audits the batch vocabulary
    * intra-batch AND against the standing dict (the same two failure
    * modes as the build-time audit in [[encode]]), and returns ONLY the
    * genuinely new `(id, value, dt, lang)` rows. O(batch) per call,
    * never O(vocabulary) — the incremental discipline shared by
    * SPARQL Update's insert arm and the streaming encoded-ingest sink
    * ([[graft.streaming.StreamOps.encodedIngestSink]]).
    */
  private[graft] def hashDictDelta(standing: DataFrame,
      values: DataFrame): DataFrame = hashDictDeltaCounted(standing, values)._1

  /** [[hashDictDelta]] plus the new-row count, for callers that would
    * otherwise pay a separate `isEmpty`/`count` action on the delta.
    *
    * r15 action discipline: the old spelling ran THREE driver actions
    * per call (intra-batch `take`, batch-vs-standing `take`, and the
    * caller's `isEmpty`), each re-executing the batch⋈dict join and
    * its broadcast builds — at update cadence (one call per op) that
    * was the single largest driver-job source in the update family.
    * Now the batch-sized join materializes ONCE (localCheckpoint — the
    * batch is update-grain by contract) and both audits plus the
    * new-row count come out of one 1-row aggregate over it; the
    * returned delta re-reads the checkpointed rows instead of
    * re-joining the dictionary.
    */
  private[graft] def hashDictDeltaCounted(standing: DataFrame,
      values: DataFrame): (DataFrame, Long) = {
    val newTerms = values.distinct()
      .select(xxhash64(col("value")).as("id"), col("value"),
        RdfLex.datatype(col("value")).as("dt"),
        RdfLex.lang(col("value")).as("lang"))
    val joined = newTerms
      .join(standing.select(col("id"), col("value").as("_old")),
        Seq("id"), "left_outer")
      .localCheckpoint()
    // one audit pass: per-id facts first (intra-batch value spread +
    // the standing value, constant within an id), then a single row
    val audit = joined
      .groupBy(col("id"))
      .agg(countDistinct(col("value")).as("_nv"),
        min(col("value")).as("_a"), max(col("value")).as("_b"),
        max(col("_old")).as("_old"))
      .agg(
        max(when(col("_nv") > 1,
          struct(col("id"), col("_a"), col("_b")))).as("dup"),
        max(when(col("_old").isNotNull && col("_old") =!= col("_a"),
          struct(col("id"), col("_a"), col("_old")))).as("clash"),
        sum(when(col("_old").isNull, 1L).otherwise(0L)).as("n_new"))
      .head()
    // intra-batch: two distinct new values sharing an id
    if (!audit.isNullAt(0)) {
      val d = audit.getStruct(0)
      throw new IllegalStateException(
        s"dictionary id collision on insert (id=${d.get(0)}: " +
          s"'${d.get(1)}' vs '${d.get(2)}') — see " +
          "TripleStore.encode scaladoc")
    }
    // batch-vs-standing: same id, different lexical value
    if (!audit.isNullAt(1)) {
      val c = audit.getStruct(1)
      throw new IllegalStateException(
        s"dictionary id collision on insert (id=${c.get(0)}" +
          s", '${c.get(1)}' vs standing '${c.get(2)}') — see " +
          "TripleStore.encode scaladoc")
    }
    (joined.filter(col("_old").isNull)
      .select(col("id"), col("value"), col("dt"), col("lang")),
      if (audit.isNullAt(2)) 0L else audit.getLong(2))
  }

  /** Load a store from the streaming encoded-ingest layout
    * ([[graft.streaming.StreamOps.encodedIngestSink]]):
    * `<root>/triples` is the (p, batch_id)-partitioned encoded
    * relation — predicate dispatch is the same partition pruning as
    * [[fromPartitionedParquet]], the `batch_id` sub-partition is the
    * sink's exactly-once replay key — and `<root>/dict` the standing
    * hash dictionary. The dict regime flag attaches per
    * [[isSequentialDict]].
    */
  def fromEncodedIngest(spark: SparkSession, root: String): TripleStore = {
    val st = fromPartitionedParquet(spark, s"$root/triples")
    val dict = spark.read.parquet(s"$root/dict")
      .select(col("id"), col("value"), col("dt"), col("lang"))
    // RDF graphs are sets, and a stream may deliver the same statement
    // in several micro-batches (distinct batch_id partitions): each
    // slice dedups at load, matching fromTriples' per-slice distinct —
    // without it streaming and batch ingest of the same dump would
    // disagree on multiplicities
    st.copy(
      slices = st.slices.map { case (p, df) => p -> df.distinct() },
      dict = Some(dict), sequential = isSequentialDict(dict))
  }

  /** Detect a persisted dictionary's id regime so a reloaded store
    * gets the right `sequential` flag (the flag is session state, not
    * file state — attaching a DENSE dict to a store the planner
    * treats as hash-id would silently resolve every constant to the
    * wrong id). Dense sequential ids are exactly 1..N by construction
    * (`max(id) == count(*) && min(id) == 1`); xxhash64 ids are
    * 2^64-sparse, where that coincidence is impossible past a handful
    * of terms. One bounded aggregate over the dict at attach time.
    */
  def isSequentialDict(dict: DataFrame): Boolean = {
    val r = dict.agg(min(col("id")), max(col("id")), count(lit(1))).head()
    !r.isNullAt(0) && r.getLong(0) == 1L && r.getLong(1) == r.getLong(2)
  }

  /** [[encode]], falling back to the SEQUENTIAL dictionary when the
    * hash ids hit their birthday bound: the collision audit that
    * previously dead-ended a >10⁹-term corpus now selects the
    * supported escape automatically. `term2id` stays injectable so
    * tests can force the collision.
    */
  def encodeAuto(
      store: TripleStore,
      term2id: Column => Column = xxhash64(_)): TripleStore =
    try encode(store, term2id)
    catch {
      case e: IllegalStateException if e.getMessage.contains("collision") =>
        encodeSequential(store)
    }

  /** Dictionary-encode with DENSE SEQUENTIAL ids — the RDF-3X-style
    * build (`Proxy.c:211-224`) for the regime past xxhash64's birthday
    * bound (~10⁹ distinct terms), where hash ids would silently alias
    * terms. Collision-free by construction, so there is no audit.
    *
    * Id assignment is the q205 banded two-phase prefix sum — nothing
    * data-sized ever reaches the driver and no single-partition
    * zipWithIndex/global sort appears: terms hash into `bands`
    * sub-vocabularies, the band histogram (≤ `bands` rows,
    * schema-sized) prefix-sums into band offsets on the driver, and
    * each band assigns `offset + row_number` under a PARTITIONED
    * window (per-band sort ≈ |vocab|/bands rows). Slices then encode
    * through two value→id joins — the one-time dictionary-build
    * shuffle every dense-id store pays at load.
    *
    * The price of dense ids is the planner's constant shortcut: a
    * query constant's id is no longer derivable by hashing, so
    * BgpPlanner resolves each constant with one bounded dict probe at
    * plan time (schema-sized; cached per plan). Column-level
    * re-encodes (subquery exports, federation, inline VALUES tables)
    * would each need a value→id join instead of an expression — those
    * surfaces stay on the hash-id store and fail loudly here.
    *
    * Persist/reload: the slices and dict write through the same
    * [[writeEncodedPartitioned]]/[[writeDict]] layouts as the hash
    * store; on reattach, derive the `sequential` flag with
    * [[isSequentialDict]] — it is session state, not file state.
    */
  /** Assign DENSE ids `startAt+1 .. startAt+N` to the distinct `value`
    * column of `vocab0` via the banded two-phase prefix sum (see
    * [[encodeSequential]]): nothing data-sized reaches the driver (the
    * band histogram is ≤ `bands` rows) and every window is PARTITIONED
    * (per-band sort ≈ |vocab|/bands rows — no single-partition global
    * sort). `startAt` continues an existing dictionary past its max id
    * (update-time growth). Returns (id, value, dt, lang) rows.
    */
  private[bgp] def assignDenseIds(vocab0: DataFrame, bands: Int,
      startAt: Long): DataFrame = {
    val spark = vocab0.sparkSession
    import spark.implicits._
    val vocab = vocab0.select(col("value")).distinct()
      .withColumn("__band", pmod(xxhash64(col("value")), lit(bands.toLong)))
    // band histogram: ≤ bands rows — the offsets collect is
    // schema-sized, the same discipline as the predicate inventory
    val hist = vocab.groupBy(col("__band")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // running offset per band: cumulative count of all earlier bands
    var acc = startAt
    val offRows = hist.map { case (b, n) =>
      val r = (b, acc); acc += n; r
    }
    // bands-sized LocalRelation: Catalyst sizes it below the broadcast
    // threshold on its own — no hint needed
    val offDf = offRows.toSeq.toDF("__band", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__band")).orderBy(col("value"))
    vocab.join(offDf, "__band")
      .withColumn("id",
        row_number().over(w).cast("long") + col("__off"))
      .select(col("id"), col("value"),
        RdfLex.datatype(col("value")).as("dt"),
        RdfLex.lang(col("value")).as("lang"))
  }

  /** Grow a SEQUENTIAL dictionary with a vocabulary DataFrame: terms
    * already in the dict keep their ids (one anti-join probe — the
    * delta-scoped discipline growDictDf's hash arm follows); genuinely
    * new terms take dense ids continuing past `max(id)` via the same
    * banded prefix sum as the build. The max(id) read is one bounded
    * aggregate — update-cadence work, never data-sized on the driver.
    */
  private[bgp] def growSequentialDict(dict: DataFrame, values: DataFrame,
      bands: Int = 256): DataFrame =
    dict.unionByName(sequentialDictDelta(dict, values, bands))

  /** Just the NEW rows [[growSequentialDict]] would append — dense ids
    * continuing past `max(id)`, deterministic for a given (dict,
    * values) pair, so delta capture and the apply itself agree on ids.
    */
  private[bgp] def sequentialDictDelta(dict: DataFrame, values: DataFrame,
      bands: Int = 256): DataFrame =
    sequentialDictDeltaCounted(dict, values, bands)._1

  /** [[sequentialDictDelta]] plus the new-row count — same action
    * discipline as [[hashDictDeltaCounted]]: the batch-sized anti-join
    * probe materializes once (localCheckpoint) so the count, the band
    * histogram inside [[assignDenseIds]], and every downstream use of
    * the delta read the checkpointed rows instead of re-probing the
    * standing dictionary per action.
    */
  private[bgp] def sequentialDictDeltaCounted(dict: DataFrame,
      values: DataFrame, bands: Int = 256): (DataFrame, Long) = {
    val fresh = values.select(col("value")).na.drop().distinct()
      .join(dict.select(col("value")), Seq("value"), "left_anti")
      .localCheckpoint()
    val nNew = fresh.count()
    val maxId = dict.agg(max(col("id"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    (assignDenseIds(fresh, bands, maxId), nNew)
  }

  def encodeSequential(store: TripleStore, bands: Int = 256): TripleStore = {
    val spark = store.slices.values.head.sparkSession
    import spark.implicits._
    val predNames = store.slices.keySet.toSeq.toDF("value")
    val vocab = (store.slices.values.toSeq
      .flatMap(df => Seq(df.select(col("s").as("value")),
        df.select(col("o").as("value"))))
      :+ predNames)
      .reduce(_ unionByName _)
    // r15: one lazy localCheckpoint on the dense dict — every slice
    // joins it twice and every downstream ACTION (pattern measurement,
    // update encode, query exec) otherwise re-runs the distinct +
    // band-window assignment from scratch; the checkpoint computes it
    // once per JVM and the ContextCleaner reclaims it with the plan.
    val dict = assignDenseIds(vocab, bands, 0L).localCheckpoint(eager = false)
    val s2id = dict.select(col("value").as("s"), col("id").as("__sid"))
    val o2id = dict.select(col("value").as("o"), col("id").as("__oid"))
    val enc = store.slices.map { case (p, df) =>
      p -> df.join(s2id, "s").join(o2id, "o")
        .select(col("__sid").as("s"), col("__oid").as("o"))
    }
    TripleStore(enc, Some(dict), sequential = true)
  }
}
