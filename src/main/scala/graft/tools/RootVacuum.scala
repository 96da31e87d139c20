package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.scale.VersionedRoot

/** Vacuum / inspect for the versioned artifact roots (TripleStore
  * datasets, SignatureStore, VectorIndex — all three share the
  * `VERSION`-pointer + `v<n>.claim` + `delta/seq=<k>(.lock)`
  * discipline): lists every version, claim, pending delta batch, and
  * slot lock with its status and bytes, and REAPS the debris crashed
  * writers leak — an orphaned `v<n>.claim` otherwise blocks version
  * `n` forever (claimVersion fails loudly on it), and dangling
  * `seq=<k>.lock` files / partial batches accumulate without bound.
  * The lakehouse `VACUUM` the retention story was missing.
  *
  * Reaping is conservative by construction:
  *  - only versions AHEAD of the pointer (crashed before their flip)
  *    are candidates — retained versions behind the pointer belong to
  *    pinned readers and are flipPointer's GC to collect;
  *  - only locks with NO complete batch (some family missing its
  *    `_SUCCESS`) are candidates — a complete batch is live data;
  *  - everything reaped must be older than `olderThanMs` (file mtime),
  *    so a writer mid-flight is never swept out from under its claim.
  */
object RootVacuum {

  final case class Entry(kind: String, name: String, status: String,
      bytes: Long)

  private def fsOf(spark: SparkSession, path: String) =
    VersionedRoot.fsOf(spark, path)

  private def sizeOf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength

  /** Delta families present under a version root (subdirectories of
    * `delta/` — artifact-agnostic; locks are files, not families).
    */
  private def familiesOf(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[String] = {
    val dp = new org.apache.hadoop.fs.Path(s"$root/delta")
    if (!fs.exists(dp)) Nil
    else fs.listStatus(dp).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  private def seqsOf(fs: org.apache.hadoop.fs.FileSystem, root: String,
      fam: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/delta/$fam")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("seq="))
        scala.util.Try(n.drop(4).toInt).toOption
      else None
    }.sorted
  }

  private def lockSeqs(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[Int] = {
    val dp = new org.apache.hadoop.fs.Path(s"$root/delta")
    if (!fs.exists(dp)) Nil
    else fs.listStatus(dp).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".lock"))
      .flatMap(st => scala.util.Try(st.getPath.getName
        .stripPrefix("seq=").stripSuffix(".lock").toInt).toOption)
      .sorted
  }

  /** Whether seq `k` under `root` is COMPLETE: every family has the
    * batch directory with its `_SUCCESS` marker.
    */
  private def complete(fs: org.apache.hadoop.fs.FileSystem, root: String,
      k: Int): Boolean = {
    val fams = familiesOf(fs, root)
    fams.nonEmpty && fams.forall(f => fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/delta/$f/seq=$k/_SUCCESS")))
  }

  /** Inventory of a versioned root: one [[Entry]] per version
    * (current / retained / orphaned), per claim (held / orphaned), per
    * pending delta batch (complete / partial), and per slot lock
    * (held / dangling). Filesystem-metadata-sized — never reads data.
    */
  def inspectEntries(spark: SparkSession, path: String): Seq[Entry] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return Nil
    val cur = VersionedRoot.currentVersion(spark, path)
    val versions = VersionedRoot.listVersions(spark, path)
    val claims = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("v") &&
        st.getPath.getName.endsWith(".claim"))
      .flatMap(st => scala.util.Try(st.getPath.getName
        .stripPrefix("v").stripSuffix(".claim").toInt).toOption)
      .sorted
    val vEntries = versions.map { v =>
      val status =
        if (cur.contains(v)) "current"
        else if (cur.exists(v < _)) "retained"
        else "orphaned" // ahead of the pointer: crashed before flip
      Entry("version", s"v$v", status,
        sizeOf(fs, new org.apache.hadoop.fs.Path(s"$path/v$v")))
    }
    val cEntries = claims.map { v =>
      val status =
        if (cur.forall(v <= _) || versions.contains(v)) "held"
        else "orphaned"
      Entry("claim", s"v$v", status, 0L)
    }
    val curRoot = cur.map(v => s"$path/v$v")
    val batchEntries = curRoot.toSeq.flatMap { root =>
      val fams = familiesOf(fs, root)
      fams.flatMap(f => seqsOf(fs, root, f)).distinct.sorted.map { k =>
        Entry("delta_batch", s"seq=$k",
          if (complete(fs, root, k)) "complete" else "partial",
          fams.map(f => sizeOf(fs,
            new org.apache.hadoop.fs.Path(s"$root/delta/$f/seq=$k"))).sum)
      }
    }
    val lockEntries = curRoot.toSeq.flatMap { root =>
      lockSeqs(fs, root).map { k =>
        Entry("lock", s"seq=$k",
          if (complete(fs, root, k)) "held" else "dangling", 0L)
      }
    }
    vEntries ++ cEntries ++ batchEntries ++ lockEntries
  }

  def inspect(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    inspectEntries(spark, path).toDF()
  }

  /** Reap crashed-writer debris older than `olderThanMs`: orphaned
    * ahead-of-pointer versions with their claims, orphaned claims with
    * no version directory, and dangling slot locks with their partial
    * family directories. Returns the reaped paths. Current and
    * retained versions, held claims, and complete batches are never
    * touched.
    */
  def reap(spark: SparkSession, path: String,
      olderThanMs: Long = 3600L * 1000): Seq[String] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return Nil
    val now = System.currentTimeMillis()
    def oldEnough(hp: org.apache.hadoop.fs.Path): Boolean =
      scala.util.Try(
        now - fs.getFileStatus(hp).getModificationTime >= olderThanMs)
        .getOrElse(false)
    val reaped = Seq.newBuilder[String]
    def rm(hp: org.apache.hadoop.fs.Path, recursive: Boolean): Unit =
      if (fs.delete(hp, recursive)) reaped += hp.toString
    val cur = VersionedRoot.currentVersion(spark, path)
    inspectEntries(spark, path).foreach {
      case Entry("version", name, "orphaned", _) =>
        val vp = new org.apache.hadoop.fs.Path(s"$path/$name")
        if (oldEnough(vp)) {
          rm(vp, recursive = true)
          val cp = new org.apache.hadoop.fs.Path(s"$path/$name.claim")
          if (fs.exists(cp)) rm(cp, recursive = false)
        }
      case Entry("claim", name, "orphaned", _) =>
        val cp = new org.apache.hadoop.fs.Path(s"$path/$name.claim")
        if (oldEnough(cp)) rm(cp, recursive = false)
      case Entry("lock", name, "dangling", _) =>
        cur.foreach { v =>
          val root = s"$path/v$v"
          val lp = new org.apache.hadoop.fs.Path(s"$root/delta/$name.lock")
          if (oldEnough(lp)) {
            // partial family dirs of the dead append go with the lock
            familiesOf(fs, root).foreach { f =>
              val bp = new org.apache.hadoop.fs.Path(
                s"$root/delta/$f/$name")
              if (fs.exists(bp)) rm(bp, recursive = true)
            }
            rm(lp, recursive = false)
          }
        }
      case _ => ()
    }
    reaped.result()
  }
}
