package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 instrumentation: per-JOB attribution inside one streaming
  * admission (the td_curation_stream steady state) — prints every Spark
  * job fired during the cleaning-plan CONSTRUCTION phase with its call
  * site and wall duration, so the ~18-job build floor Round13Probe
  * measured can be attributed operator by operator.
  *
  * Modes:
  *   jobtrace — batch-2 admission, job-by-job log (default)
  *   e2etrace — the composed batch pipeline's run(), job-by-job log
  */
object Round14Probe {

  private final class JobLog extends org.apache.spark.scheduler.SparkListener {
    final case class J(id: Int, site: String, t0: Long,
                       var t1: Long = 0L, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val site = Option(js.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      jobs.put(js.jobId, J(js.jobId, site, System.nanoTime()))
      ()
    }
    override def onJobEnd(
        je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      Option(jobs.get(je.jobId)).foreach(_.t1 = System.nanoTime())
      ()
    }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      Option(jobs.get(te.stageId)).foreach(_ => ())
      ()
    }
    def dump(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      jobs.values.asScala.toSeq.sortBy(_.id).foreach { j =>
        val ms = if (j.t1 > 0) (j.t1 - j.t0) / 1e6 else -1.0
        println(f"""{"metric":"job_trace","tag":"$tag","job":${j.id},""" +
          f""""site":"${j.site}","ms":$ms%.0f}""")
      }
      jobs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("jobtrace")
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r14_jt_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    val bench = docs.where(col("doc_id") < 10)
    val log = new JobLog
    mode match {
      case "e2etrace" =>
        graft.store.CorpusStore.write(spark, s"$base/pub",
          Seq.empty[(Long, String)].toDF("doc_id", "text"),
          "doc_id", "text", nShards = 8)
        spark.sparkContext.addSparkListener(log)
        val t0 = System.nanoTime()
        graft.pipeline.CurationPipeline.run(spark,
          docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
          bench, "text",
          when(col("text").contains("the"), 1.0).otherwise(0.2),
          idx, s"$base/pub").summary.collect()
        println(f"""{"metric":"e2e_wall","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        Thread.sleep(800)
        log.dump("e2e")
      case _ =>
        graft.store.CorpusStore.write(spark, s"$base/pub",
          Seq.empty[(Long, String)].toDF("doc_id", "text"),
          "doc_id", "text", nShards = 8)
        // batch 1 primes store + JIT; trace batch 2 (the steady state)
        graft.stream.StreamingCuration.processBatch(
          docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === 0),
          "doc_id", "text", bench, "text", idx, s"$base/pub")
        spark.sparkContext.addSparkListener(log)
        val t0 = System.nanoTime()
        graft.stream.StreamingCuration.processBatch(
          docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === 1),
          "doc_id", "text", bench, "text", idx, s"$base/pub")
        println(f"""{"metric":"batch2_wall","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        Thread.sleep(800)
        log.dump("batch2")
    }
    spark.stop()
  }
}
