package graft
object AqeProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val q = SparkEntry.queries("q31_bgp_triangle")
    val df = q(spark, sfDir)
    val t0 = System.nanoTime()
    val plan = df.queryExecution.executedPlan
    plan.execute().foreachPartition((_: Iterator[_]) => ())
    println(f"AQEPROBE time=${(System.nanoTime()-t0)/1e9}%.2f")
    val fin = plan.toString
    println("AQEPROBE-PLAN-BEGIN")
    println(fin.take(8000))
    println("AQEPROBE-PLAN-END")
    spark.stop()
  }
}
