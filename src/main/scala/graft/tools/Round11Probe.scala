package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 measurement probes (round-10 verdict items 1, 2, 4, 5, 7):
  *
  *  - `e2e2pass`: the composed curation pipeline run TWICE in one session
  *    against the SAME index dir (rebuilt before each pass, the Bench
  *    two-pass protocol), with an RDD-level block sweep between passes
  *    simulating memory-pressure eviction — the stale-cached-plan state
  *    the path-scoped drains exist for. Reports both walls + summary
  *    equality (item 1's probe row).
  *  - `wpdist`: the distributed WordPiece trainer
  *    (driverMaxDistinctSeqs = 0) — parity vs the driver face, then the
  *    rounds-cost curve (item 4; the BPE-face protocol of Round10Probe
  *    applied to the second grow-a-vocab family).
  *  - `abquality`: same-session interleaved A/B of the null-safe
  *    (nullif/coalesce) quality + gopher faces vs the round-9
  *    pre-null-safe expressions, inlined verbatim (item 5 — the only two
  *    >1.5× movers on the r9→r10 common universe; their code changed, so
  *    attribute the movement to code or to the box's ~1.3× ambient band).
  *  - `incr`: the incremental cross-snapshot dedup face ISOLATED — build
  *    the band index over the seen 80% of the corpus, run new×seen for
  *    the fresh 20%, merged-min over two passes (item 7: confirm
  *    per-found-pair cost stays flat as the seen index grows a decade).
  *
  * Usage: Round11Probe <mode> [sfDir]. Prints one JSON line per
  * measurement.
  */
object Round11Probe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("e2e2pass")
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
      case "e2e2pass" => e2eTwoPass(spark, sfDir)
      case "e2e2stage" => e2eTwoPassStaged(spark, sfDir)
      case "wpdist" => wordpieceDistributed(spark, sfDir)
      case "abquality" => abQuality(spark, sfDir)
      case "incr" => incrementalIsolated(spark, sfDir)
      case "incrauto" => incrementalAuto(spark, sfDir)
      case other => sys.error(s"unknown mode: $other")
    } finally spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Item 1's probe: the e2e gate's exact recipe, twice in one session,
    * index rebuilt at the same pid-stable path before each pass, every
    * persisted block evicted in between.
    */
  private def e2eTwoPass(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(80L, n * 16 / 100).toInt
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r11_e2e_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    def onePass(): (Seq[Seq[Any]], Double) = timed {
      // auto-planned family (numHashes = 0): the pipeline's default path
      // since the adoption change — the probe measures what callers run
      val idx = graft.store.DedupIndexStore.build(spark, s"$base/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        numHashes = 0)
      val r = graft.pipeline.CurationPipeline.run(spark,
        docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
        benchmark = docs.where(col("doc_id") < 10), benchTextCol = "text",
        dsirTarget =
          col("source").isin("src0", "src1", "src2", "src3", "src4"),
        index = idx, publishDir = s"$base/pub",
        cfg = graft.pipeline.CurationPipeline.Config(dsirK = k))
      r.summary.collect().toSeq.map(_.toSeq)
    }
    val (s1, t1) = onePass()
    // memory pressure between the daily runs: blocks evicted, SQL-level
    // registry entries (had the drains missed any) kept
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val (s2, t2) = onePass()
    println(s"""{"metric":"e2e_two_pass","docs":$n,"k":$k,""" +
      s""""pass1_sec":${f"$t1%.1f"},"pass2_sec":${f"$t2%.1f"},""" +
      s""""summaries_equal":${s1 == s2}}""")
  }

  /** The two-pass protocol with staged=true in both passes — per-stage
    * attribution of any pass-2 drift (same recipe as [[e2eTwoPass]]).
    */
  private def e2eTwoPassStaged(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(80L, n * 16 / 100).toInt
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r11_e2es_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    for (pass <- 1 to 2) {
      val (idx, idxSec) = timed {
        graft.store.DedupIndexStore.build(spark, s"$base/idx",
          docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
          numHashes = 0)
      }
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
      println(s"""{"metric":"e2e2s_stage","pass":$pass,""" +
        s""""stage":"0_admit_history","sec":${f"$idxSec%.1f"}}""")
      res.stats.foreach { s =>
        println(s"""{"metric":"e2e2s_stage","pass":$pass,""" +
          s""""stage":"${s.stage}","rows":${s.rows},""" +
          s""""sec":${f"${s.seconds}%.1f"}}""")
      }
      println(s"""{"metric":"e2e2s_total","pass":$pass,""" +
        s""""sec":${f"$total%.1f"}}""")
      if (pass == 1)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(true))
    }
  }

  /** Item 4: distributed WordPiece — parity at 6 rounds, then the
    * rounds-cost curve with the driver bound disabled, then the driver
    * face at 6 rounds for the crossover comparison.
    */
  private def wordpieceDistributed(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    val n = docs.count()
    val drv = graft.pipeline.WordPiece.wordpieceMerges(docs, "text",
        rounds = 6)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val dist = graft.pipeline.WordPiece.wordpieceMerges(docs, "text",
        rounds = 6, driverMaxDistinctSeqs = 0L)
      .orderBy("round").collect().map(_.toSeq).toSeq
    println(s"""{"metric":"wpdist_parity","docs":$n,""" +
      s""""equal":${drv == dist}}""")
    for (rounds <- Seq(6, 50, 200)) {
      val (m, s) = timed {
        graft.pipeline.WordPiece.wordpieceMerges(docs, "text", rounds,
          driverMaxDistinctSeqs = 0L).count()
      }
      println(s"""{"metric":"wpdist_rounds","docs":$n,"rounds":$rounds,""" +
        s""""merges":$m,"sec":${f"$s%.1f"}}""")
    }
    val (_, sDrv) = timed {
      graft.pipeline.WordPiece.wordpieceMerges(docs, "text", rounds = 6)
        .count()
    }
    println(s"""{"metric":"wpdist_driver_face","docs":$n,"rounds":6,""" +
      s""""sec":${f"$sDrv%.1f"}}""")
    docs.unpersist()
    ()
  }

  /** Item 5: interleaved same-session A/B. Variant A = the CURRENT
    * null-safe faces; variant B = the round-9 expressions, inlined
    * verbatim from the pre-change commit (no nullif/coalesce). Both run
    * the gates' exact projections, forced by the noop sink Bench uses.
    * 5 interleaved reps each; report min + median.
    */
  private def abQuality(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- round-9 withQuality, verbatim (no nullif)
    def r9Quality(d: DataFrame): DataFrame = {
      val t = col("text")
      val toks = tokens(t)
      val nChars = length(t).cast("double")
      val nAlpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
      val nPunct = length(regexp_replace(t, "[a-zA-Z0-9 ]", "")).cast("double")
      val nToks = size(toks).cast("double")
      val stopHits = size(filter(toks, x => array_contains(
        array(graft.pipeline.TextAnalysis.stopwords("en").map(lit): _*), x)))
        .cast("double")
      d.withColumn("n_chars", length(t))
        .withColumn("n_tokens", size(toks))
        .withColumn("alpha_ratio", round(nAlpha / nChars, 4))
        .withColumn("punct_ratio", round(nPunct / nChars, 4))
        .withColumn("stopword_ratio", round(stopHits / nToks, 4))
        .withColumn("quality_score",
          round(lit(0.4) * (nAlpha / nChars) + lit(0.3) * (stopHits / nToks) +
            lit(0.3) * least(lit(1.0), nToks / lit(100.0)), 4))
    }
    // --- round-9 withGopherRules, verbatim (no nullif/coalesce)
    def r9Gopher(d: DataFrame): DataFrame = {
      val t = col("text")
      val toks = tokens(t)
      val nWords = size(toks).cast("double")
      val wordChars =
        length(regexp_replace(normText(t), " ", "")).cast("double")
      val stopHits = size(array_intersect(array_distinct(toks),
        array(graft.pipeline.TextAnalysis.stopwords("en").map(lit): _*)))
      val symbolHits =
        size(regexp_extract_all(t, lit("#|\\.\\.\\."), lit(0)))
      val alphaWords = size(filter(toks, x => x.rlike("[a-z]"))).cast("double")
      d.withColumn("n_words", size(toks))
        .withColumn("mean_wlen", round(wordChars / nWords, 4))
        .withColumn("stop_hits", stopHits)
        .withColumn("symbol_ratio", round(symbolHits / nWords, 4))
        .withColumn("alpha_frac", round(alphaWords / nWords, 4))
        .withColumn("keep",
          col("n_words") >= 50 && col("n_words") <= 100000 &&
            col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0 &&
            col("symbol_ratio") < 0.1 && col("alpha_frac") > 0.8 &&
            col("stop_hits") >= 2)
    }
    val qualityCols = Seq("doc_id", "n_chars", "n_tokens", "alpha_ratio",
      "punct_ratio", "stopword_ratio", "quality_score")
    val gopherCols = Seq("doc_id", "n_words", "mean_wlen", "stop_hits",
      "symbol_ratio", "alpha_frac", "keep")
    val faces: Seq[(String, () => Unit)] = Seq(
      "quality_r10" -> (() => force(graft.pipeline.TextAnalysis
        .withQuality(docs, "text")
        .select(qualityCols.map(col): _*).orderBy("doc_id"))),
      "quality_r9" -> (() => force(r9Quality(docs)
        .select(qualityCols.map(col): _*).orderBy("doc_id"))),
      "gopher_r10" -> (() => force(graft.pipeline.TextAnalysis
        .withGopherRules(docs, "text")
        .select(gopherCols.map(col): _*).orderBy("doc_id"))),
      "gopher_r9" -> (() => force(r9Gopher(docs)
        .select(gopherCols.map(col): _*).orderBy("doc_id"))))
    // warmup each once, then 5 interleaved timed reps
    faces.foreach(_._2())
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to 5; (name, fn) <- faces) {
      val (_, s) = timed(fn())
      times(name) = times(name) :+ s
    }
    faces.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(s"""{"metric":"ab_quality","face":"$name",""" +
        s""""min_sec":${f"${ts.head}%.3f"},""" +
        s""""median_sec":${f"${ts(ts.size / 2)}%.3f"},""" +
        s""""reps":${ts.size}}""")
    }
  }

  /** The auto-planned index build (numHashes = 0: family priced from the
    * sampled pair-similarity distribution at ADMISSION time) against the
    * same seen/new split as [[incrementalIsolated]] — the build-time
    * lever for candidate densification. Reports the planned family, the
    * candidate volume it admits, and the adopted-family query cost.
    */
  private def incrementalAuto(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val seen = docs.where(col("doc_id") % 5 =!= 4)
    val fresh = docs.where(col("doc_id") % 5 === 4)
    val (nSeen, nFresh) = (seen.count(), fresh.count())
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r11_incra_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    val (idx, idxSec) = timed {
      graft.store.DedupIndexStore.build(spark, s"$base/idx", seen,
        "doc_id", "text", numHashes = 0)
    }
    val (_, h, b) = idx.params
    val passes = (1 to 2).map { _ =>
      timed {
        graft.pipeline.Dedup.crossCorpusPairsIndexed(fresh, "doc_id",
          "text", idx, numHashes = 0, bands = 0, threshold = 0.8).count()
      }
    }
    val pairs = passes.head._1
    val sec = passes.map(_._2).min
    import graft.functions.TextFunctions._
    val rowsPerBand = h / b
    val newBands = fresh
      .select(col("doc_id"), shingleSet(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), posexplode(
        bandKeys(minhashSig(col("sh"), h), b, rowsPerBand))
        .as(Seq("band", "key")))
    val candidates = newBands.alias("x")
      .join(idx.bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("seen_id"))
      .distinct().count()
    println(s"""{"metric":"incr_auto","seen":$nSeen,"new":$nFresh,""" +
      s""""planned_hashes":$h,"planned_bands":$b,""" +
      s""""index_build_sec":${f"$idxSec%.1f"},"pairs":$pairs,""" +
      s""""candidates":$candidates,"query_sec":${f"$sec%.1f"}}""")
  }

  /** Item 7: the incremental face isolated. Seen = 80% of the corpus
    * (admitted to a fresh band index), new = the remaining 20%; the
    * timed unit is crossCorpusPairsIndexed end-to-end (two passes,
    * merged min).
    */
  private def incrementalIsolated(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val seen = docs.where(col("doc_id") % 5 =!= 4)
    val fresh = docs.where(col("doc_id") % 5 === 4)
    val (nSeen, nFresh) = (seen.count(), fresh.count())
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_r11_incr_" +
      ProcessHandle.current().pid()
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    val (idx, idxSec) = timed {
      graft.store.DedupIndexStore.build(spark, s"$base/idx", seen,
        "doc_id", "text")
    }
    val passes = (1 to 2).map { _ =>
      timed {
        graft.pipeline.Dedup.crossCorpusPairsIndexed(fresh, "doc_id",
          "text", idx, threshold = 0.8).count()
      }
    }
    val pairs = passes.head._1
    val sec = passes.map(_._2).min
    // the cost driver is the CANDIDATE volume (the ScaleUp corpus
    // densifies cross-copy siblings quadratically); count it with the
    // face's own band-join derivation so per-candidate cost is reportable
    import graft.functions.TextFunctions._
    val (n, numHashes, nBands) = idx.params
    val rowsPerBand = numHashes / nBands
    val newBands = fresh
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), posexplode(
        bandKeys(minhashSig(col("sh"), numHashes), nBands, rowsPerBand))
        .as(Seq("band", "key")))
    val candidates = newBands.alias("x")
      .join(idx.bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("seen_id"))
      .distinct().count()
    val usPerCand =
      if (candidates > 0) sec * 1e6 / candidates else -1.0
    println(s"""{"metric":"incr_isolated","seen":$nSeen,"new":$nFresh,""" +
      s""""index_build_sec":${f"$idxSec%.1f"},"pairs":$pairs,""" +
      s""""candidates":$candidates,"query_sec":${f"$sec%.1f"},""" +
      s""""us_per_candidate":${f"$usPerCand%.2f"}}""")
  }
}
