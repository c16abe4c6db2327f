package graft

import java.nio.file.{Files, Paths}

/** Indexing-throughput benchmark — the reference's headline metric is
  * wall-clock / files-per-second over a repo tree (gkg-benchmark-config.toml,
  * indexer.rs:342-358 logs files/sec). Generates a deterministic synthetic
  * Python tree (seeded counter content, no RNG), indexes it end-to-end, and
  * prints one JSON line with stage timings and files/sec.
  *
  * Usage: runMain graft.IndexBench [nFiles]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000)
    val root = Files.createTempDirectory("graft-indexbench")
    graft.extract.SyntheticTree.generate(root, nFiles)

    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "index-bench")
    val t0 = System.nanoTime()
    val files = graft.extract.FileScanner.scan(spark, root.toString, "bench")
    val nScanned = files.count()
    val t1 = System.nanoTime()
    val store = graft.analyze.Indexer.index(spark, files)
    val counts = new graft.query.QueryLibrary(store.cacheAll()).graphStats().head()
    val t2 = System.nanoTime()
    val out = Files.createTempDirectory("graft-indexbench-store").toString
    store.write(out)
    val t3 = System.nanoTime()
    val total = (t3 - t0) / 1e9
    println(s"""{"metric":"index_files_per_sec","value":${nScanned / total},""" +
      s""""files":$nScanned,"definitions":${counts.getAs[Long]("definition_count")},""" +
      s""""edges_def_to_def":${counts.getAs[Long]("DEF_TO_DEF")},""" +
      s""""scan_s":${(t1 - t0) / 1e9},"analyze_s":${(t2 - t1) / 1e9},""" +
      s""""write_s":${(t3 - t2) / 1e9},"total_s":$total}""")
    spark.stop()
  }
}
