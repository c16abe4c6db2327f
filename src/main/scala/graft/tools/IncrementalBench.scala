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
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
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
}
