package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measurement driver (SCALE.md evidence generator).
  *
  * Modes:
  *  - `streamjobs`: per-admission Spark-JOB attribution for the streaming
  *    curation path (the composed gates' fixed-cost floor, verdict item
  *    2). A SparkListener counts every job launched by one processBatch
  *    and sums task time vs wall — the gap between wall and task time is
  *    the serialized job-submission floor the fusion work attacks.
  *  - `e2ejobs`: the same attribution for the one-shot composed pipeline
  *    (td_pipeline_e2e's body).
  */
object Round13Probe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
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

  private def withJobCount[T](spark: SparkSession)(f: => T)
      : (T, Int, Int, Double) = {
    val c = new JobCounter
    spark.sparkContext.addSparkListener(c)
    try {
      val r = f
      // listener bus is async (and its drain face is spark-private):
      // give the tail events a beat to land before reading the counters
      Thread.sleep(1500)
      (r, c.jobs.get(), c.tasks.get(), c.taskTimeNs.get() / 1e9)
    } finally spark.sparkContext.removeSparkListener(c)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("streamjobs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") match {
          case "0" => "false"; case _ => "true" })
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    mode match {
      case "streamjobs" => streamJobs(spark, sfDir)
      case "streamphases" => streamPhases(spark, sfDir)
      case "e2ejobs" => e2eJobs(spark, sfDir)
      case other => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }

  private def streamJobs(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r13_sj_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    graft.store.CorpusStore.write(spark, s"$base/pub",
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", nShards = 8)
    val bench = docs.where(col("doc_id") < 10)
    Seq(0L, 1L).foreach { parity =>
      val ((_, wall), jobs, tasks, taskSec) = withJobCount(spark) {
        timed {
          graft.stream.StreamingCuration.processBatch(
            docs.where(col("doc_id") % 5 =!= 0 &&
              col("doc_id") % 4 === parity),
            "doc_id", "text", bench, "text", idx, s"$base/pub")
        }
      }
      println(f"""{"metric":"stream_jobs","batch":${parity + 1},""" +
        f""""wall_sec":$wall%.2f,"jobs":$jobs,"tasks":$tasks,""" +
        f""""task_sec":$taskSec%.2f}""")
    }
  }

  /** Phase-level job attribution INSIDE one admission: replays
    * processBatch's structure piecewise (replay guard / cleanedPlan
    * eager internals / survivors checkpoint / corpus append / index
    * append) with a job counter around each — locates which phase owns
    * the 70-job floor streamjobs measures.
    */
  private def streamPhases(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r13_ph_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    val bench = docs.where(col("doc_id") < 10)
    // batch 1 primes store + JIT; attribute batch 2 (the steady state)
    graft.store.CorpusStore.write(spark, s"$base/pub",
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", nShards = 8)
    graft.stream.StreamingCuration.processBatch(
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === 0),
      "doc_id", "text", bench, "text", idx, s"$base/pub")
    def phase[T](name: String)(f: => T): T = {
      val ((r, wall), jobs, tasks, taskSec) = withJobCount(spark)(timed(f))
      println(f"""{"metric":"stream_phase","phase":"$name",""" +
        f""""wall_sec":$wall%.2f,"jobs":$jobs,"tasks":$tasks,""" +
        f""""task_sec":$taskSec%.2f}""")
      r
    }
    val scope = graft.operators.TransientCache.beginScope()
    val batch = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === 1)
    val fresh = phase("replay_guard") {
      batch.join(graft.store.CorpusStore.docs(spark, s"$base/pub")
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
    }
    val live = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    val persistStage = { (_: String) => (df: org.apache.spark.sql.DataFrame) =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      live += p; p
    }
    val cleaned = phase("cleaned_plan_build") {
      graft.pipeline.CurationPipeline.cleanedPlan(fresh, "doc_id", "text",
        bench, "text", idx, graft.pipeline.CurationPipeline.Config(),
        persistStage).select("doc_id", "text")
    }
    val survivors = phase("survivors_checkpoint") {
      cleaned.localCheckpoint(true)
    }
    val n = phase("survivors_count")(survivors.count())
    live.foreach(_.unpersist(false))
    graft.operators.TransientCache.drainPath(s"$base/pub")
    graft.operators.TransientCache.drainPath(idx.dir)
    phase("corpus_append") {
      graft.store.CorpusStore.append(spark, s"$base/pub", survivors,
        "doc_id", "text")
    }
    phase("index_append") {
      idx.append(survivors, "doc_id", "text")
    }
    graft.operators.TransientCache.drainScope(scope)
    println(s"""{"metric":"stream_phase_total","rows":$n}""")
  }

  private def e2eJobs(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r13_ej_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    val bench = docs.where(col("doc_id") < 10)
    val ((_, wall), jobs, tasks, taskSec) = withJobCount(spark) {
      timed {
        graft.pipeline.CurationPipeline.run(spark,
          docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
          bench, "text",
          when(col("text").contains("the"), 1.0).otherwise(0.2),
          idx, s"$base/pub").summary.collect()
      }
    }
    println(f"""{"metric":"e2e_jobs","wall_sec":$wall%.2f,""" +
      f""""jobs":$jobs,"tasks":$tasks,"task_sec":$taskSec%.2f}""")
  }
}
