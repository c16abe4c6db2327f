package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 per-gate profiler (SCALE.md / OPTIMIZATION_r13.md evidence
  * generator): runs named gates from [[graft.SparkEntry.queries]] under a
  * Spark job/task listener and prints one JSON line per gate per rep —
  * wall seconds, number of jobs launched, number of tasks, and summed task
  * time. The (wall − task/cores) gap is the serialized job-submission /
  * planning floor; `jobs` tells how many sequential actions the gate pays.
  *
  * Modes (env):
  *  - SPARK_GRAFT_PROF_REPS   reps per gate (default 2; report each)
  *  - SPARK_GRAFT_PROF_PLAN   "1" additionally writes the formatted plan to
  *                            plans/r13/<gate>_<tag>.txt
  *  - SPARK_GRAFT_PROF_TAG    plan filename suffix (default "before")
  *  - SPARK_GRAFT_AQE         "0" disables AQE session-wide (A/B lever)
  *
  * Usage: runMain graft.tools.GateProf <gate> [gate...]
  */
object GateProf {

  private final class Counter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTimeNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      Option(te.taskInfo).foreach(ti =>
        taskTimeNs.addAndGet((ti.finishTime - ti.launchTime) * 1000000L))
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateProf <gateName> [gateName...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    val dumpPlan = sys.env.getOrElse("SPARK_GRAFT_PROF_PLAN", "0") == "1"
    val tag = sys.env.getOrElse("SPARK_GRAFT_PROF_TAG", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        if (sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "0") "false"
        else "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    // same warm protocol as Bench: long-lived serving state outside timing
    if (sys.env.getOrElse("SPARK_GRAFT_WARM_GRAPH", "1") != "0") {
      val st = graft.SparkEntry.storeFor(spark, sfDir)
      Seq(st.directories, st.files, st.definitions, st.importedSymbols,
        st.edges, st.symmetrizedEdges).foreach(_.count())
      graft.SparkEntry.warmGraph(spark, sfDir)
    }
    val permanent = spark.sparkContext.getPersistentRDDs.keySet
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown gate: $name"))
      (1 to reps).foreach { rep =>
        val c = new Counter
        spark.sparkContext.addSparkListener(c)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        Thread.sleep(800) // let the async listener bus drain
        spark.sparkContext.removeSparkListener(c)
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!permanent(id)) rdd.unpersist(blocking = false)
        }
        println(f"""{"metric":"gate_prof","gate":"$name","rep":$rep,""" +
          f""""wall_sec":${(t1 - t0) / 1e9}%.2f,""" +
          f""""build_sec":${(tPlan - t0) / 1e9}%.2f,""" +
          f""""jobs":${c.jobs.get()},"tasks":${c.tasks.get()},""" +
          f""""task_sec":${c.taskTimeNs.get() / 1e9}%.2f}""")
        if (dumpPlan && rep == reps) {
          val planDir = sys.env.getOrElse("SPARK_GRAFT_PROF_PLAN_DIR",
            "plans/r13")
          val out = java.nio.file.Paths.get(s"$planDir/${name}_$tag.txt")
          java.nio.file.Files.createDirectories(out.getParent)
          java.nio.file.Files.write(out,
            fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }
    spark.stop()
  }
}
