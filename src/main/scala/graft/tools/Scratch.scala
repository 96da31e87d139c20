package graft.tools

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = graft.SparkEntry.queries +
      ("q31x_triangle_enc" -> graft.queries.BgpQueries.triangleEncoded)
    for (name <- args) {
      val t0 = System.nanoTime()
      val df = qs(name)(spark, sfDir)
      val n = df.count()
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
