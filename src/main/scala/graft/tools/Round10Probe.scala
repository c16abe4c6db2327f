package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 measurement probes (VERDICT r9 next-round items 1, 2, 6, 7):
  *
  *  - `e2e`: the full curation-pipeline DAG in staged mode — per-stage
  *    rows + wall time over a scale-factor corpus (item 1's sf10
  *    rehearsal; every stage passes alone, this measures them COMPOSED).
  *  - `bpedist`: the distributed BPE merge loop (`bpeMergesDistributed`,
  *    forced via driverMaxDistinctSeqs = 0) — the production path above
  *    the 2M-distinct-sequence driver bound, never decade-measured
  *    before; parity vs the driver face checked on the same corpus, then
  *    a rounds-cost curve.
  *
  * Usage: Round10Probe <mode> [sfDir]. Prints one JSON line per
  * measurement.
  */
object Round10Probe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("e2e")
    val sfDir = args.lift(1).getOrElse("/root/repo/bench-data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.default.parallelism", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    try mode match {
      case "e2e" => e2ePipeline(spark, sfDir)
      case "bpedist" => bpeDistributed(spark, sfDir)
      case "minhashspot" => minhashSpot(spark, sfDir)
      case "minhashplan" => minhashPlanOnly(spark, sfDir)
      case other => sys.error(s"unknown mode: $other")
    } finally spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Staged end-to-end curation run over the SF corpus: the gate's exact
    * recipe (history = doc_id % 5 = 0 pre-admitted to the persisted index,
    * benchmark = doc_id < 10, DSIR target = src0-src4) with the sampling
    * budget scaled to the corpus (16% of raw docs, the sf0.01 gate's
    * ratio). Prints one line per stage plus the total.
    */
  private def e2ePipeline(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(80L, n * 16 / 100).toInt
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r10_e2e_" +
      ProcessHandle.current().pid()
    val (idx, idxSec) = timed {
      graft.store.DedupIndexStore.build(spark, s"$base/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    }
    println(s"""{"metric":"e2e_stage","stage":"0_admit_history",""" +
      s""""rows":${n / 5},"sec":${f"$idxSec%.2f"}}""")
    val (res, total) = timed {
      val r = graft.pipeline.CurationPipeline.run(spark,
        docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
        benchmark = docs.where(col("doc_id") < 10), benchTextCol = "text",
        dsirTarget =
          col("source").isin("src0", "src1", "src2", "src3", "src4"),
        index = idx, publishDir = s"$base/pub",
        cfg = graft.pipeline.CurationPipeline.Config(dsirK = k),
        staged = true)
      r.summary.collect() // force the read-back summary
      r
    }
    res.stats.foreach { s =>
      println(s"""{"metric":"e2e_stage","stage":"${s.stage}",""" +
        s""""rows":${s.rows},"sec":${f"${s.seconds}%.2f"}}""")
    }
    println(s"""{"metric":"e2e_total","docs":$n,"k":$k,""" +
      s""""sec":${f"$total%.2f"}}""")
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
  }

  /** The auto-planned MinHash face alone, merged-min over two passes —
    * the sf30 third-decade spot-check (the fixed-banding face is known
    * super-linear and is NOT the production path; rerunning it at sf30
    * would measure a face the planner exists to replace).
    */
  private def minhashSpot(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (sampledPairs, sampledJ) = graft.pipeline.Dedup
      .estimateJaccardSample(docs, "doc_id", "text")
    val nDocs = docs.count()
    val (h, b) = graft.pipeline.Dedup.minhashPlanForSample(
      nDocs, 0.8, sampledPairs, sampledJ)
    val midMass = sampledJ.count(j => j >= 0.1 && j < 0.8)
    val passes = (1 to 2).map { _ =>
      timed {
        graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
          numHashes = 0, bands = 0, threshold = 0.8).count()
      }
    }
    val nAuto = passes.head._1
    val sAuto = passes.map(_._2).min
    println(s"""{"metric":"minhash_spot","docs":$nDocs,""" +
      s""""sampled_pairs":$sampledPairs,"mid_mass_pairs":$midMass,""" +
      s""""planned_hashes":$h,"planned_bands":$b,""" +
      s""""auto_pairs":$nAuto,"auto_sec":${f"$sAuto%.1f"}}""")
  }

  /** Plan-only variant: the sampling + plan math without the full run. */
  private def minhashPlanOnly(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (sampledPairs, sampledJ) = graft.pipeline.Dedup
      .estimateJaccardSample(docs, "doc_id", "text")
    val nDocs = docs.count()
    val (h, b) = graft.pipeline.Dedup.minhashPlanForSample(
      nDocs, 0.8, sampledPairs, sampledJ)
    val midMass = sampledJ.count(j => j >= 0.1 && j < 0.8)
    println(s"""{"metric":"minhash_plan","docs":$nDocs,""" +
      s""""sampled_pairs":$sampledPairs,"mid_mass_pairs":$midMass,""" +
      s""""planned_hashes":$h,"planned_bands":$b}""")
  }

  /** The distributed BPE face, decade row: parity vs the driver face at 6
    * rounds (same merge table, order-sensitive compare), then the
    * rounds-cost curve with the driver bound disabled.
    */
  private def bpeDistributed(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    val n = docs.count()
    val drv = graft.pipeline.TextAnalysis.bpeMerges(docs, "text", rounds = 6)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val dist = graft.pipeline.TextAnalysis
      .bpeMerges(docs, "text", rounds = 6, driverMaxDistinctSeqs = 0L)
      .orderBy("round").collect().map(_.toSeq).toSeq
    println(s"""{"metric":"bpedist_parity","docs":$n,""" +
      s""""equal":${drv == dist}}""")
    for (rounds <- Seq(6, 50, 200)) {
      val (m, s) = timed {
        graft.pipeline.TextAnalysis.bpeMerges(docs, "text", rounds,
          driverMaxDistinctSeqs = 0L).count()
      }
      println(s"""{"metric":"bpedist_train","rounds":$rounds,"docs":$n,""" +
        s""""merges":$m,"sec":${f"$s%.2f"}}""")
    }
    docs.unpersist()
    ()
  }
}
