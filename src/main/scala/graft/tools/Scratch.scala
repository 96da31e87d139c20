package graft.tools

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // ad-hoc session overrides, e.g. SPARK_GRAFT_CONF="spark.sql.codegen.wholeStage=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val qs = graft.SparkEntry.queries +
      ("q31x_triangle_enc" -> graft.queries.BgpQueries.triangleEncoded) ++
      ScratchVariants.all
    // "all" sweeps the whole registry (alphabetical) and ends with the
    // ten slowest — the outlier hunt after a batch of new operators
    val names =
      if (args.sameElements(Array("all"))) qs.keys.toSeq.sorted else args.toSeq
    // SPARK_GRAFT_NOOP=1 materializes through the noop sink exactly
    // like Bench (count() lets Spark prune non-predicate columns, so
    // its times are not comparable with BENCH artifacts); REPS>1 times
    // each query that many times in the warm JVM and reports the min.
    val noop = sys.env.contains("SPARK_GRAFT_NOOP")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    // SPARK_GRAFT_JOBS=1: count Spark jobs per timed query — a tiny-data
    // query burning seconds is usually many sequential driver actions
    // (each ~50-150 ms of scheduling), and the job count is the first
    // number that distinguishes "slow stage" from "too many stages".
    val jobCounter = new java.util.concurrent.atomic.AtomicLong
    val jobSites =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    if (sys.env.contains("SPARK_GRAFT_JOBS"))
      // action-level view: every root SQL execution (collect/take/
      // isEmpty/save/checkpoint) with its call site — the broadcast-
      // pool jobs above don't carry a submitter stack, but every one
      // of them belongs to some execution counted here
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onOtherEvent(
              e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
            e match {
              case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
                  if s.rootExecutionId.forall(_ == s.executionId) =>
                jobSites.merge(s"exec:${s.description.takeWhile(_ != '\n')}",
                  1L, (a, b) => a + b)
                ()
              case _ => ()
            }
        })
    if (sys.env.contains("SPARK_GRAFT_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobCounter.incrementAndGet()
            val site = js.stageInfos.lastOption.map { si =>
              si.details.linesIterator
                .find(l => l.contains("graft.") && !l.contains("Scratch"))
                .getOrElse(si.name.takeWhile(_ != '+')).trim
            }.getOrElse("?")
            jobSites.merge(site, 1L, (a, b) => a + b)
            ()
          }
        })
    val timed = names.map { name =>
      var n = -1L
      val secs = Seq.fill(reps) {
        val t0 = System.nanoTime()
        val df = qs(name)(spark, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save()
        else n = df.count()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = secs.min
      val df = qs(name)(spark, sfDir)
      val rowNote = if (noop) "noop sink" else s"$n rows"
      val jobNote =
        if (sys.env.contains("SPARK_GRAFT_JOBS"))
          s", ${jobCounter.getAndSet(0L)} jobs" else ""
      println(f"[scratch] $name: $sec%.2f s (reps=$reps: " +
        secs.map(s => f"$s%.2f").mkString(",") + s"), $rowNote$jobNote")
      if (sys.env.contains("SPARK_GRAFT_JOBS") && !jobSites.isEmpty) {
        import scala.jdk.CollectionConverters._
        val top = jobSites.asScala.toSeq.sortBy(-_._2).take(12)
          .map { case (k, v) => s"$k×$v" }.mkString(", ")
        println(s"[scratch]   job sites: $top")
        jobSites.clear()
      }
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
      if (sys.env.contains("SPARK_GRAFT_PLAN_TREE")) {
        df.collect() // materialize THIS plan so AQE finalizes its stages
        println(df.queryExecution.executedPlan.toString)
      }
      name -> sec
    }
    if (names.size > 10)
      println("[scratch] slowest: " + timed.sortBy(-_._2).take(10)
        .map { case (n, s) => f"$n=$s%.2f" }.mkString(", "))
    spark.stop()
  }
}
