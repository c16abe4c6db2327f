package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 measurement probes (round-11 verdict items 2, 4, 7):
  *
  *  - `e2eauto`: the staged composed-pipeline protocol of
  *    `Round10Probe e2e`, with the history index built AUTO-PLANNED
  *    (`DedupIndexStore.build(numHashes = 0)`) — the pipeline now adopts
  *    the stored family, so this re-measures stage 4a (new×seen) under
  *    the family the planner prices at admission time (item 2: the
  *    isolated rows showed 5× at sf30; this is the composed confirmation).
  *  - `resumetax`: the durability tax of `runResumable` vs `run` — same
  *    corpus, same recipe, fresh dirs each: (a) one-shot `run`, (b)
  *    `runResumable` from scratch, (c) `runResumable` killed at the
  *    tokenizer boundary then resumed (what a mid-run failure costs end
  *    to end). Item 4's decade rows.
  *  - `streamprof`: td_curation_stream in-gate attribution (item 7) —
  *    the gate wall split into the STREAMING ADMISSION half (the two
  *    foreachBatch rounds: cleaning + publish + index admit) and the
  *    VALIDATION half (manifest/census/sketch replay the gate performs so
  *    its oracle can check it), timed separately at gate scale.
  *
  * Usage: Round12Probe <mode> [sfDir]. One JSON line per measurement.
  */
object Round12Probe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("resumetax")
    val sfDir = args.lift(1).getOrElse("/root/repo/bench-data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.default.parallelism", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    try mode match {
      case "e2eauto" => e2eAuto(spark, sfDir)
      case "resumetax" => resumeTax(spark, sfDir)
      case "streamprof" => streamProf(spark, sfDir)
      case "streamstages" => streamStages(spark, sfDir)
      case other => sys.error(s"unknown mode: $other")
    } finally spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Item 2: the Round10Probe e2e staged recipe with numHashes = 0 on the
    * history admission — the pipeline's stage 4 adopts the stored family.
    */
  private def e2eAuto(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(80L, n * 16 / 100).toInt
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r12_e2ea_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val (idx, idxSec) = timed {
      graft.store.DedupIndexStore.build(spark, s"$base/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        numHashes = 0)
    }
    val (_, h, b) = idx.params
    println(s"""{"metric":"e2ea_stage","stage":"0_admit_history",""" +
      s""""rows":${n / 5},"sec":${f"$idxSec%.2f"},""" +
      s""""planned_hashes":$h,"planned_bands":$b}""")
    val (res, total) = timed {
      val r = graft.pipeline.CurationPipeline.run(spark,
        docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
        benchmark = docs.where(col("doc_id") < 10), benchTextCol = "text",
        dsirTarget =
          col("source").isin("src0", "src1", "src2", "src3", "src4"),
        index = idx, publishDir = s"$base/pub",
        cfg = graft.pipeline.CurationPipeline.Config(dsirK = k),
        staged = true)
      r.summary.collect()
      r
    }
    res.stats.foreach { s =>
      println(s"""{"metric":"e2ea_stage","stage":"${s.stage}",""" +
        s""""rows":${s.rows},"sec":${f"${s.seconds}%.2f"}}""")
    }
    println(s"""{"metric":"e2ea_total","docs":$n,"k":$k,""" +
      s""""sec":${f"$total%.2f"}}""")
  }

  /** Item 4: one-shot vs resumable vs killed-then-resumed, fresh dirs for
    * each arm (identical inputs; the published summaries are compared so
    * a divergent arm would be caught before its timing is believed).
    */
  private def resumeTax(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(80L, n * 16 / 100).toInt
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r12_rt_" +
      ProcessHandle.current().pid()
    val cfg = graft.pipeline.CurationPipeline.Config(dsirK = k)
    def freshIdx(tag: String) = {
      graft.SparkEntry.registerTmpCleanup(s"$base/$tag")
      graft.store.DedupIndexStore.build(spark, s"$base/$tag/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    }
    val batch = docs.where(col("doc_id") % 5 =!= 0)
    val bench = docs.where(col("doc_id") < 10)
    val target = col("source").isin("src0", "src1", "src2", "src3", "src4")

    def oneShot(tag: String): (Seq[Seq[Any]], Double) = {
      val idx = freshIdx(tag)
      timed {
        graft.pipeline.CurationPipeline.run(spark, batch, "doc_id", "text",
          bench, "text", target, idx, s"$base/$tag/pub", cfg)
          .summary.collect().toSeq.map(_.toSeq)
      }
    }
    def resumable(tag: String, kill: String): (Seq[Seq[Any]], Double) = {
      val idx = freshIdx(tag)
      timed {
        def go(k2: String) = graft.pipeline.CurationPipeline.runResumable(
          spark, batch, "doc_id", "text", bench, "text", target, idx,
          s"$base/$tag/pub", s"$base/$tag/work", cfg,
          checkpoint = s =>
            if (s == kill) throw new RuntimeException(s"killed after $s"))
        if (kill == "none") go("none").summary.collect().toSeq.map(_.toSeq)
        else {
          try { go(kill); () }
          catch { case _: RuntimeException => () }
          graft.pipeline.CurationPipeline.runResumable(
            spark, batch, "doc_id", "text", bench, "text", target, idx,
            s"$base/$tag/pub", s"$base/$tag/work", cfg)
            .summary.collect().toSeq.map(_.toSeq)
        }
      }
    }
    val (sRun, tRun) = oneShot("run")
    val (sRes, tRes) = resumable("res", kill = "none")
    val (sKill, tKill) = resumable("kill", kill = "tokenizer")
    println(s"""{"metric":"resume_tax","docs":$n,"k":$k,""" +
      s""""run_sec":${f"$tRun%.1f"},"resumable_sec":${f"$tRes%.1f"},""" +
      s""""killed_resumed_sec":${f"$tKill%.1f"},""" +
      s""""summaries_equal":${sRun == sRes && sRes == sKill}}""")
  }

  /** Item 7: td_curation_stream's exact gate recipe with each half timed —
    * the streaming-admission work (index build, store seed, two
    * processBatch rounds) vs the gate's own oracle-side validation
    * (validate + checksum census), so the gate wall is attributable.
    */
  private def streamProf(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r12_sp_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    val (idx, tIdx) = timed {
      graft.store.DedupIndexStore.build(spark, s"$base/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    }
    val (_, tSeed) = timed {
      graft.store.CorpusStore.write(spark, s"$base/pub",
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text", nShards = 8)
    }
    val bench = docs.where(col("doc_id") < 10)
    val batchSecs = Seq(0L, 1L).map { parity =>
      timed {
        graft.stream.StreamingCuration.processBatch(
          docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === parity),
          "doc_id", "text", bench, "text", idx, s"$base/pub")
      }._2
    }
    val (_, tValidate) = timed {
      graft.store.CorpusStore.validate(spark, s"$base/pub", "doc_id", "text")
    }
    val (_, tCensus) = timed {
      val sums = graft.store.CorpusStore.docs(spark, s"$base/pub")
        .groupBy("shard")
        .agg(sum(graft.functions.TextFunctions.charFold(col("text")))
          .as("checksum"))
      graft.store.CorpusStore.manifest(spark, s"$base/pub")
        .join(sums, Seq("shard"))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          col("checksum"))
        .orderBy("shard").collect()
    }
    println(s"""{"metric":"stream_prof","docs":$n,""" +
      s""""index_build_sec":${f"$tIdx%.2f"},""" +
      s""""store_seed_sec":${f"$tSeed%.2f"},""" +
      s""""batch1_sec":${f"${batchSecs.head}%.2f"},""" +
      s""""batch2_sec":${f"${batchSecs(1)}%.2f"},""" +
      s""""validate_sec":${f"$tValidate%.2f"},""" +
      s""""census_sec":${f"$tCensus%.2f"}}""")
  }

  /** Per-stage attribution inside one micro-batch's cleaning half: the
    * gate's batch-1 input run through cleanedPlan with a force-and-time
    * stage wrapper (the streamProf rows attribute the gate wall between
    * admission and validation; this attributes WITHIN the admission).
    */
  private def streamStages(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r12_ss_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    val bench = docs.where(col("doc_id") < 10)
    val batch =
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === 0)
    val stats =
      scala.collection.mutable.ListBuffer.empty[(String, Long, Double, Double)]
    val tStart = System.nanoTime()
    val stage = { (name: String) => (df: org.apache.spark.sql.DataFrame) =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val n = p.count()
      stats += ((name, n, (System.nanoTime() - t0) / 1e9,
        (System.nanoTime() - tStart) / 1e9))
      p
    }
    val (nOut, tAll) = timed {
      graft.pipeline.CurationPipeline.cleanedPlan(batch, "doc_id", "text",
        bench, "text", idx, graft.pipeline.CurationPipeline.Config(), stage)
        .count()
    }
    stats.foreach { case (name, n, s, at) =>
      println(s"""{"metric":"stream_stage","stage":"$name","rows":$n,""" +
        s""""sec":${f"$s%.2f"},"done_at":${f"$at%.2f"}}""")
    }
    println(s"""{"metric":"stream_stage_total","rows":$nOut,""" +
      s""""sec":${f"$tAll%.2f"}}""")
  }
}
