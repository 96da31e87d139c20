package graft.scale

import org.apache.spark.sql.SparkSession

/** Shared delta-log machinery for the versioned `scale/` artifacts
  * ([[SignatureStore]], [[VectorIndex]]): `seq=<k>` append batches
  * under a version root, create-exclusive `seq=<k>.lock` slot claims
  * carrying an idempotency token, completeness checks (`_SUCCESS` in
  * every family), and the compaction manifest (`COMPACTED`) that makes
  * append-vs-compaction races lost-update-safe — an appender that
  * finds the pointer moved consults the manifest and carries its batch
  * forward iff the compaction missed it.
  *
  * (The reference's only persisted incremental artifact is the
  * append-grain stats cache — `PlanCostEstimator.cpp:1053-1085`
  * appends measurements and never recomputes the table; this object
  * is that discipline generalized to multi-family parquet batches.)
  */
private[graft] object DeltaLog {

  /** `seq=` numbers whose batch is COMPLETE under `root`: every family
    * directory present with its `_SUCCESS` marker, so a mid-write or
    * crashed append is excluded from compaction snapshots, loads, and
    * the compaction trigger.
    */
  def completeSeqs(fs: org.apache.hadoop.fs.FileSystem, root: String,
      families: Seq[String]): Seq[Int] = {
    def seqsOf(fam: String): Set[Int] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/delta/$fam")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("seq=") &&
            fs.exists(new org.apache.hadoop.fs.Path(
              s"$root/delta/$fam/$n/_SUCCESS")))
          scala.util.Try(n.drop(4).toInt).toOption
        else None
      }.toSet
    }
    families.map(seqsOf).reduce(_ intersect _).toSeq.sorted
  }

  /** The seq slot whose lock file carries token `t` under `root`. */
  def tokenLockIn(fs: org.apache.hadoop.fs.FileSystem, r: String,
      t: String): Option[Int] = {
    val dp = new org.apache.hadoop.fs.Path(s"$r/delta")
    if (!fs.exists(dp)) None
    else fs.listStatus(dp).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".lock"))
      .find(st => VersionedRoot.readSmall(fs, st.getPath).contains(t))
      .flatMap(st => scala.util.Try(st.getPath.getName
        .stripPrefix("seq=").stripSuffix(".lock").toInt).toOption)
  }

  /** Whether `token` was already claimed under a RETAINED version root
    * other than `root` — the crash-after-compaction replay: the
    * batch's rows live in the compacted base, so appending again would
    * duplicate them.
    */
  def tokenAbsorbedElsewhere(spark: SparkSession, path: String,
      root: String, token: String): Boolean = {
    val (fs, _) = VersionedRoot.fsOf(spark, path)
    VersionedRoot.listVersions(spark, path)
      .map(v => s"$path/v$v").filter(_ != root)
      .exists(r => tokenLockIn(fs, r, token).isDefined)
  }

  /** Claim an append slot under `root`: reclaim the slot whose lock
    * already carries `token` (replay overwrites its own batch —
    * effectively-once), else walk forward from `next` until a
    * create-exclusive lock wins.
    */
  def claimSlot(fs: org.apache.hadoop.fs.FileSystem, root: String,
      next: Int, token: Option[String]): Int = {
    val reclaimed = token.flatMap(t => tokenLockIn(fs, root, t))
    reclaimed.getOrElse {
      var k = next
      var tries = 0
      while (!VersionedRoot.claim(fs,
          new org.apache.hadoop.fs.Path(s"$root/delta/seq=$k.lock"),
          token.getOrElse(""))) {
        k += 1
        tries += 1
        require(tries < 10000, s"could not claim an append slot under $root")
      }
      k
    }
  }

  /** First unclaimed-looking seq number: one past the max over lock
    * files and `keyFamily` batch dirs (the create-exclusive lock in
    * [[claimSlot]] is what actually arbitrates).
    */
  def nextSeq(fs: org.apache.hadoop.fs.FileSystem, root: String,
      keyFamily: String): Int = {
    def maxIn(p: org.apache.hadoop.fs.Path, pre: String, post: String): Int =
      if (!fs.exists(p)) -1
      else fs.listStatus(p).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(pre) && n.endsWith(post))
          scala.util.Try(
            n.stripPrefix(pre).stripSuffix(post).toInt).toOption
        else None
      }.foldLeft(-1)(math.max)
    math.max(
      maxIn(new org.apache.hadoop.fs.Path(s"$root/delta/$keyFamily"),
        "seq=", ""),
      maxIn(new org.apache.hadoop.fs.Path(s"$root/delta"),
        "seq=", ".lock")) + 1
  }

  /** Record the exact batches a compaction merged, in the NEW version
    * root: first line `from=v<oldVer>`, then one merged seq per line.
    */
  def writeCompacted(fs: org.apache.hadoop.fs.FileSystem, newRoot: String,
      fromVer: Int, seqs: Seq[Int]): Unit = {
    val mp = new org.apache.hadoop.fs.Path(s"$newRoot/COMPACTED")
    val out = fs.create(mp, true)
    try out.write((s"from=v$fromVer" +: seqs.map(_.toString))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Whether seq `k` of version `oldVer` was merged by a later
    * compaction: Some(true/false) when a retained later version's
    * `COMPACTED` manifest answers, None when no manifest chains back
    * to `oldVer` — a full rebuild superseded the root, and the batch's
    * content is re-derivable from the authoritative inputs, so callers
    * treat None as absorbed.
    */
  def absorbedByCompaction(spark: SparkSession, path: String,
      oldVer: Int, k: Int): Option[Boolean] = {
    val (fs, _) = VersionedRoot.fsOf(spark, path)
    VersionedRoot.listVersions(spark, path)
      .filter(_ > oldVer).sorted.collectFirst {
        Function.unlift { (v: Int) =>
          VersionedRoot.readSmall(fs,
            new org.apache.hadoop.fs.Path(s"$path/v$v/COMPACTED"))
            .filter(_.linesIterator.next() == s"from=v$oldVer")
            .map(_.linesIterator.drop(1)
              .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
              .contains(k))
        }
      }
  }

  /** The version number encoded in a `.../v<n>` root path. */
  def verOf(root: String): Int =
    root.substring(root.lastIndexOf("/v") + 2).toInt
}
