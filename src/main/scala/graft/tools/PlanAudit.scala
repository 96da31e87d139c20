package graft.tools

/** Ad-hoc audit: which registry queries plan a native RangeJoin/AsOfJoin. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("8")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val tags = Seq(
          if (plan.contains("RangeJoin")) Some("RangeJoin") else None,
          if (plan.contains("AsOfJoin")) Some("AsOfJoin") else None).flatten
        if (tags.nonEmpty) println(s"[audit] $name: ${tags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
