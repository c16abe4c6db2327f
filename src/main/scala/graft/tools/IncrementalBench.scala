package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state measurement for the persisted-index incremental dedup —
  * separates the ONE-TIME admission cost (DedupIndexStore.build over the
  * historical corpus) from the PER-RUN cost a daily ingest pays
  * (crossCorpusPairsIndexed: shingle+sign the new batch, equi-join the
  * stored band table, verify candidates on the stored shingle sets).
  *
  * The dd_incremental gate intentionally replays admission every run so the
  * oracle can reconstruct the whole derivation; the operational claim in
  * SCALE.md ("per-run cost independent of history size") is what THIS main
  * measures: build once, then time the query alone, multiple passes, min.
  *
  * Prints one JSON line: {"sf":…, "build_s":…, "query_s":…, "pairs":N}.
  *
  * A third argument `appends=N` switches to COMPACTION mode: build the
  * index on a slice of the seen corpus, admit the rest as N separate
  * appends (each append lands its own key-partitioned file set — the
  * fragmentation a daily ingest accumulates), time the indexed query over
  * the fragmented store, `compact()`, re-time, and assert the pair set is
  * unchanged. Prints {"mode":"appends", "appends":N, "frag_files":…,
  * "frag_query_s":…, "compacted_files":…, "compacted_query_s":…}.
  *
  * `annappends=N` runs the same protocol against the OTHER persisted
  * index: AnnIndexStore built on an embedding slice, N frozen-quantizer
  * appends fragmenting the cid cells, stored-probe topK timed before and
  * after `compact()` with result equality asserted.
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val appendsMode = args.lift(2).collect {
      case a if a.startsWith("appends=") => a.stripPrefix("appends=").toInt
    }
    val annAppendsMode = args.lift(2).collect {
      case a if a.startsWith("annappends=") =>
        a.stripPrefix("annappends=").toInt
    }
    val autoAppendsMode = args.lift(2).collect {
      case a if a.startsWith("autoappends=") =>
        a.stripPrefix("autoappends=").toInt
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_inc_bench").toString

    appendsMode.foreach { nAppends =>
      runAppendsMode(spark, sfDir, docs, idxDir, runs, nAppends)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      spark.stop()
      return
    }
    annAppendsMode.foreach { nAppends =>
      runAnnAppendsMode(spark, sfDir, idxDir, runs, nAppends)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      spark.stop()
      return
    }
    autoAppendsMode.foreach { nAppends =>
      runAutoAppendsMode(spark, sfDir, docs, idxDir, runs, nAppends)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val idx = graft.store.DedupIndexStore.build(spark, idxDir,
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    // force the write to finish and the meta to be readable
    idx.params
    val buildS = (System.nanoTime() - t0) / 1e9

    var pairs = 0L
    val times = (1 to runs).map { _ =>
      val q0 = System.nanoTime()
      val res = graft.pipeline.Dedup.crossCorpusPairsIndexed(
        docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text", idx,
        threshold = 0.8)
      res.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - q0) / 1e9
      pairs = res.count()
      dt
    }
    def r3(v: Double) = (math.round(v * 1000) / 1000.0).toString
    println(s"""{"sf":"$sfDir","build_s":${r3(buildS)},""" +
      s""""query_s":${r3(times.min)},"pairs":$pairs}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    spark.stop()
  }

  /** Compaction mode: fragment the index with `nAppends` admissions, time
    * the indexed query before and after `compact()`, assert identical pair
    * counts.
    */
  private def runAppendsMode(spark: SparkSession, sfDir: String,
      docs: org.apache.spark.sql.DataFrame, idxDir: String, runs: Int,
      nAppends: Int): Unit = {
    val seen = docs.where(col("doc_id") % 5 === 0)
    val fresh = docs.where(col("doc_id") % 5 =!= 0)
    val slice = (col("doc_id") / 5).cast("long") % (nAppends + 1)

    val idx = graft.store.DedupIndexStore.build(spark, idxDir,
      seen.where(slice === 0), "doc_id", "text")
    // auto-compaction OFF: this mode MEASURES the fragmentation the
    // policy exists to bound (autoappends mode measures the policy)
    (1 to nAppends).foreach(j =>
      idx.append(seen.where(slice === j), "doc_id", "text",
        autoCompactFiles = 0))

    def parquetFiles(sub: String): Int =
      org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(s"$idxDir/$sub"),
          Array("parquet"), true).size()
    def timeQuery(): (Double, Long) = {
      var pairs = 0L
      val times = (1 to runs).map { _ =>
        val q0 = System.nanoTime()
        val res = graft.pipeline.Dedup.crossCorpusPairsIndexed(
          fresh, "doc_id", "text", idx, threshold = 0.8)
        res.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - q0) / 1e9
        pairs = res.count()
        dt
      }
      (times.min, pairs)
    }

    val fragFiles = parquetFiles("bands")
    val (fragS, fragPairs) = timeQuery()
    val c0 = System.nanoTime()
    idx.compact()
    val compactS = (System.nanoTime() - c0) / 1e9
    val compFiles = parquetFiles("bands")
    val (compS, compPairs) = timeQuery()
    require(fragPairs == compPairs,
      s"compaction changed the result: $fragPairs -> $compPairs")
    def r3(v: Double) = (math.round(v * 1000) / 1000.0).toString
    println(s"""{"mode":"appends","sf":"$sfDir","appends":$nAppends,""" +
      s""""frag_files":$fragFiles,"frag_query_s":${r3(fragS)},""" +
      s""""compact_s":${r3(compactS)},"compacted_files":$compFiles,""" +
      s""""compacted_query_s":${r3(compS)},"pairs":$fragPairs}""")
  }

  /** The POLICY face of [[runAppendsMode]]: the same N-admission loop but
    * with the admission-time auto-compaction live (a deliberately low
    * file threshold so the trigger engages at gate scale), reporting how
    * many admissions compacted, the final file count, and the query time
    * the steady-state ingest loop actually pays — the "query time
    * restored WITHOUT an operator intervening" row for SCALE.md.
    */
  private def runAutoAppendsMode(spark: SparkSession, sfDir: String,
      docs: org.apache.spark.sql.DataFrame, idxDir: String, runs: Int,
      nAppends: Int): Unit = {
    val seen = docs.where(col("doc_id") % 5 === 0)
    val fresh = docs.where(col("doc_id") % 5 =!= 0)
    val slice = (col("doc_id") / 5).cast("long") % (nAppends + 1)
    val threshold = sys.env.getOrElse("GRAFT_AUTOCOMPACT_FILES", "200").toInt
    val idx = graft.store.DedupIndexStore.build(spark, idxDir,
      seen.where(slice === 0), "doc_id", "text")
    def parquetFiles: Int = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(s"$idxDir/bands"), Array("parquet"), true)
      .size()
    var compactions = 0
    (1 to nAppends).foreach { j =>
      val before = parquetFiles
      idx.append(seen.where(slice === j), "doc_id", "text",
        autoCompactFiles = threshold)
      if (parquetFiles < before) compactions += 1
    }
    var pairs = 0L
    val times = (1 to runs).map { _ =>
      val q0 = System.nanoTime()
      val res = graft.pipeline.Dedup.crossCorpusPairsIndexed(
        fresh, "doc_id", "text", idx, threshold = 0.8)
      res.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - q0) / 1e9
      pairs = res.count()
      dt
    }
    def r3(v: Double) = (math.round(v * 1000) / 1000.0).toString
    println(s"""{"mode":"autoappends","sf":"$sfDir","appends":$nAppends,""" +
      s""""threshold":$threshold,"compactions":$compactions,""" +
      s""""final_files":$parquetFiles,"query_s":${r3(times.min)},""" +
      s""""pairs":$pairs}""")
  }

  /** ANN twin of [[runAppendsMode]]: fragment AnnIndexStore's cid cells
    * with frozen-quantizer appends, time the stored probe before/after
    * compact(), assert identical neighbor sets.
    */
  private def runAnnAppendsMode(spark: SparkSession, sfDir: String,
      idxDir: String, runs: Int, nAppends: Int): Unit = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val slice = (col("vec_id") % (nAppends + 1))
    val idx = graft.store.AnnIndexStore.build(spark, idxDir,
      embs.where(slice === 0), "vec_id", "embedding")
    // auto-compaction OFF: measuring the fragmentation itself
    (1 to nAppends).foreach(j =>
      idx.append(embs.where(slice === j), "vec_id", "embedding",
        autoCompactFiles = 0))

    val queries = embs.where(col("vec_id") % 97 === 0)
    def parquetFiles: Int = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(s"$idxDir/cells"), Array("parquet"), true)
      .size()
    def timeQuery(): (Double, Set[(Long, Long, Int)]) = {
      var res = Set.empty[(Long, Long, Int)]
      val times = (1 to runs).map { _ =>
        val q0 = System.nanoTime()
        val out = idx.topK(queries, "vec_id", "embedding", k = 5, nprobe = 4)
        out.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - q0) / 1e9
        res = out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(3))).toSet
        dt
      }
      (times.min, res)
    }
    val fragFiles = parquetFiles
    val (fragS, fragRes) = timeQuery()
    val c0 = System.nanoTime()
    idx.compact()
    val compactS = (System.nanoTime() - c0) / 1e9
    val compFiles = parquetFiles
    val (compS, compRes) = timeQuery()
    require(fragRes == compRes, "compaction changed the probe results")
    def r3(v: Double) = (math.round(v * 1000) / 1000.0).toString
    println(s"""{"mode":"annappends","sf":"$sfDir","appends":$nAppends,""" +
      s""""frag_files":$fragFiles,"frag_query_s":${r3(fragS)},""" +
      s""""compact_s":${r3(compactS)},"compacted_files":$compFiles,""" +
      s""""compacted_query_s":${r3(compS)},"neighbors":${fragRes.size}}""")
  }
}
