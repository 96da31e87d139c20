package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the similarity-search sibling of
  * [[SignatureStore]]: coarse cells, their centroids, and the
  * cell-bucketed vector assignments live as a versioned parquet
  * artifact a query batch PROBES, instead of re-deriving centroids
  * from the corpus per run (q117's inline spelling).
  *
  * Layout:
  * {{{
  *   <path>/VERSION              — current version pointer
  *   <path>/v<n>/assignments/label=<c>/ — (vec_id, v, nrm) PER CELL
  *   <path>/v<n>/centroids       — (label, i, cx) componentwise sums
  *   <path>/v<n>/cnorms          — (label, cnrm)
  * }}}
  *
  * Scale design — the probe is the point:
  *  - `assignments` is parquet PARTITIONED BY the cell label, so a
  *    probe reads exactly its probed cells' directories (partition
  *    pruning — VectorIndexSpec pins `PartitionFilters` on the scan
  *    and that no non-index file is touched). At 100 TB with nlist
  *    cells, a (queries × nprobe) search reads nprobe/nlist of the
  *    corpus, never all of it.
  *  - cell ranking runs against the PERSISTED centroids (nlist × dim
  *    rows — index metadata, not corpus data); the probe-cell set is
  *    (queries × nprobe)-sized, collected under a loud bound
  *    ([[MaxProbeCells]]) because the label list must be LITERAL for
  *    partition pruning to engage.
  *  - scoring joins the pruned assignments scan against the
  *    guarded-broadcast query set; the only shuffle is the
  *    top-k-per-query rank over candidate rows.
  *
  * Exactness: vectors quantize with the SimilarityQueries spelling
  * (floor(x·10⁴ + ½) per element — float→double exact, integer dot
  * products order-independent), centroids are componentwise integer
  * SUMS (no division — cosine is scale-invariant, so the un-normalized
  * sum ranks cells identically to the mean and stays exact), and ties
  * break (score DESC, label/cid ASC) — bit-identical to the q117
  * in-line spelling, which is exactly what q390's oracle replays.
  */
object VectorIndex {

  /** Bump when the quantization/centroid spelling changes — [[ensure]]
    * rebuilds a mismatched index.
    */
  val FormatVersion = 1

  /** Retained versions (readers pinned to the old version finish). */
  val KeepVersions = 2

  /** Bound on the probe-cell literal list (queries × nprobe distinct
    * labels). Cells are index metadata — a probe set past this is a
    * mis-tuned search, failed loudly instead of un-pruning the scan.
    */
  val MaxProbeCells = 256

  /** 4-decimal integer quantization + integer norm (the
    * SimilarityQueries oracle contract).
    */
  private def quantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
          .as("v"))
      .withColumn("nrm",
        expr("aggregate(transform(v, x -> x * x), cast(0 as bigint), (a, x) -> a + x)"))

  /** Write `emb` (vec_id, embedding: array<float>, label) as the NEXT
    * full version: cell-partitioned assignments + centroid sums.
    */
  def write(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val n = VersionedRoot.currentVersion(spark, path).map(_ + 1).getOrElse(0)
    VersionedRoot.claimVersion(spark, path, n)
    val q = quantize(emb)
    q.select(col("vec_id"), col("v"), col("nrm"), col("label"))
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$path/v$n/assignments")
    val flat = q.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
    val cs = flat.groupBy(col("label"), col("i")).agg(sum(col("x")).as("cx"))
    cs.write.mode("overwrite").parquet(s"$path/v$n/centroids")
    cs.groupBy(col("label")).agg(sum(col("cx") * col("cx")).as("cnrm"))
      .write.mode("overwrite").parquet(s"$path/v$n/cnorms")
    VersionedRoot.flipPointer(spark, path, n, KeepVersions)
    val (fs, _) = VersionedRoot.fsOf(spark, path)
    val mp = new org.apache.hadoop.fs.Path(s"$path/FORMAT")
    val out = fs.create(mp, true)
    try out.write(FormatVersion.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Build iff absent or format-stale (the pstore pattern). */
  def ensure(emb: => DataFrame, path: String, spark: SparkSession): Unit = {
    val (fs, _) = VersionedRoot.fsOf(spark, path)
    val marker = VersionedRoot.readSmall(fs,
      new org.apache.hadoop.fs.Path(s"$path/FORMAT"))
    val fresh = VersionedRoot.currentVersion(spark, path).isDefined &&
      marker.contains(FormatVersion.toString)
    if (!fresh) {
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      write(emb, path)
    }
  }

  /** Top-`k` same-index neighbors for `queries` (qid, qv: array<long>,
    * qn) over the `nprobe` best cells per query. Cell ranking and
    * scoring reproduce q117's arithmetic exactly; the assignments
    * scan prunes to the probed cells' partitions.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int = 2, k: Int = 3): DataFrame = {
    val root = VersionedRoot.root(spark, path, "vector index")
    val cs = spark.read.parquet(s"$root/centroids")
    val csn = spark.read.parquet(s"$root/cnorms")
    val qs = GuardedBroadcast.pin(queries)
    // cell ranking: query × centroid dots at (query × dim) grain —
    // the centroid side is index METADATA (nlist × dim rows)
    val qflat = qs.select(col("qid"), col("qn"),
      posexplode(col("qv")).as(Seq("i", "x")))
    val pd = qflat.join(cs, Seq("i"))
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("x") * col("cx")).as("cdot"))
    val ps = pd
      .join(GuardedBroadcast.maybe(qs.select(col("qid"), col("qn"))),
        Seq("qid"))
      .join(GuardedBroadcast.maybe(csn), Seq("label"))
      .select(col("qid"), col("label"),
        (col("cdot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cnrm").cast("double"))))
          .as("cscore"))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("cscore").desc, col("label").asc)
    val probes = ps.withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe).select(col("qid"), col("label"))
    val probesP = GuardedBroadcast.pin(probes)
    // LITERAL probe-cell list → partition pruning on the assignments
    // scan; bounded loudly (see MaxProbeCells)
    val cells = probesP.select(col("label")).distinct()
      .limit(MaxProbeCells + 1).collect().map(_.get(0))
    require(cells.length <= MaxProbeCells,
      s"probe set spans more than $MaxProbeCells cells — a probe list " +
        "must stay index-metadata-sized for the pruned scan")
    val cand = spark.read.parquet(s"$root/assignments")
      .filter(col("label").isin(cells.toSeq: _*))
    val scored = cand
      .join(GuardedBroadcast.maybe(probesP.join(qs, Seq("qid"))),
        Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        (expr("dot_i64(qv, v)").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
