package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * The graph-store caches are force-built before timing (the reference's
  * analog: Kuzu DB already loaded when queries run) so measurements reflect
  * query execution, not first-touch cache population.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args: restrict to these query names (local profiling loop;
    // the driver invokes with no args = full run)
    val only = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Round-13 measured NON-change (OPTIMIZATION_r13.md): lowering
      // spark.sql.adaptive.coalescePartitions.minPartitionSize to 64k
      // un-serializes the CPU-heavy text gates (AQE's byte-based
      // coalescing collapses their few-MB shuffles to 1-2 tasks:
      // dd_containment_prefix 9.7 -> 2.9 s) but costs MORE across the
      // ~100 small and iterative gates (extra tiny tasks per round;
      // g_kcore +3.7 s, full bench +9 s net), so the session keeps
      // Spark's default floor. SPARK_GRAFT_MIN_PARTITION_SIZE overrides
      // for experiments.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"))
      // Round-13: the driver-side codegen class cache defaults to 100
      // entries (static conf) — this suite compiles thousands of distinct
      // whole-stage classes per pass, so the LRU thrashes and every gate's
      // SECOND pass (usually the reported min) re-pays Janino compilation
      // for each stage. Tens of MB of driver memory buys compile-once.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      // ContextCleaner reclaims broadcasts/shuffle state only on GC; with a
      // 48g heap GC barely runs, so ~70 queries of state pile up and the
      // eventual full GC lands mid-measurement on late queries. The default
      // periodic-GC interval is 30min — far longer than the whole run.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)

    // warm: build + materialize the graph-store and GraphX caches once —
    // these are the long-lived serving state (the reference's analog: the
    // Kuzu DB stays open across queries). SPARK_GRAFT_WARM_GRAPH=0 skips it
    // for name-restricted runs over non-graph gates (the sf30 third-decade
    // spot-checks: warming a 420M-edge GraphX cache to time five
    // documents-table gates would measure the warmup, not the gates).
    if (sys.env.getOrElse("SPARK_GRAFT_WARM_GRAPH", "1") != "0") {
      val st = SparkEntry.storeFor(spark, sfDir)
      Seq(st.directories, st.files, st.definitions, st.importedSymbols,
        st.edges, st.symmetrizedEdges).foreach(_.count())
      SparkEntry.warmGraph(spark, sfDir)
    }
    // every RDD cached from here on is a per-query intermediate (e.g. the
    // dedup operators' candidate caches); drop them after each query so 63
    // queries' worth never accumulates into storage-eviction thrash
    val permanent = spark.sparkContext.getPersistentRDDs.keySet

    // noop sink forces full materialization (a global count() would let
    // Catalyst prune the projected columns and eliminate the final sort —
    // the benchmark would measure less work than the query does)
    // NOTE on cache hygiene: the store-MUTATING faces drain their own
    // operator caches (graft.operators.TransientCache — StreamingCuration
    // per batch, StreamingAnnIndex per admission), which is where the
    // stale-plan-substitution hazard lives. Bench deliberately does NOT
    // drain between queries: pass-2 minimums measuring warm repeat cost
    // (shared fragments like the normalized-vector table substituting
    // across gates) are the documented hyperfine-min protocol, and an
    // unconditional drain here measured a flat +25% across the cache-
    // sharing gates while fixing nothing Bench-visible.
    // returns whether the gate RAN to completion. A failed run must never
    // contribute its time-to-failure to the per-gate MIN — round 13
    // caught a gate whose second pass threw early and "won" the min at
    // 0.05x of its true cost, silently converting a correctness bug into
    // a phantom speedup. Failures time as FailedRunSec (a loud sentinel
    // in the artifact) and print a gate_error line.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean = {
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      // Round-13: drain the operator-cache REGISTRY before the RDD-block
      // sweep. The sweep alone frees a registered fragment's blocks but
      // leaves its CacheManager entry, so every later matching plan
      // (the same gate's next pass, or a sibling gate sharing the
      // fragment) substitutes a dead InMemoryRelation that recomputes per
      // consumer and never re-materializes — dd_containment_prefix
      // measured 8.5 s under that trap vs 2.8 s cold. Draining makes each
      // pass honestly cold for operator internals; the long-lived serving
      // caches (graph store, GraphX topology, session memos) are not
      // registry entries and stay warm. SPARK_GRAFT_DRAIN=0 restores the
      // old sweep-only behavior for A/B.
      if (sys.env.getOrElse("SPARK_GRAFT_DRAIN", "1") != "0")
        graft.operators.TransientCache.drain()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!permanent(id)) rdd.unpersist(blocking = false)
      }
      ok
    }
    val FailedRunSec = 99999.0
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    // multiple timed passes, report per-query MIN — the reference's own
    // harness shape (gkg-benchmark-config.toml: hyperfine warmup 1, 3 runs,
    // min). Pass 1 doubles as the JIT/codegen/cache warmup, so wall time
    // matches the old warmup+single-timed scheme while the min filters out
    // ambient-load noise (observed ±30% run-to-run on single passes).
    // SPARK_GRAFT_RUNS=1 restores single-pass (with WARM=1 for a warmup).
    val runsN = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    if (runsN == 1 && sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0")
      qs0.foreach { case (_, fn) => run(fn); () }
    // fixed CALIBRATION row (round-13 ambient hardening): a
    // corpus-independent codegen-bound computation timed min-of-3 and
    // recorded in the artifact, so a judge comparing BENCH_rN across
    // sessions can normalize out this box's measured ~1.3x ambient drift
    // (two consecutive rounds burned attribution effort on it) instead of
    // guessing which side moved.
    def calibrate(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // mod before the sum: 2^28 raw xxhash64 longs overflow an ANSI
      // Long sum; 2^28 x 10^6 stays far inside it
      spark.range(1L << 28)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(
              org.apache.spark.sql.functions.col("id")),
            org.apache.spark.sql.functions.lit(1000000L)))).head()
      (System.nanoTime() - t0) / 1e9
    }.min
    val calibration = calibrate()
    def timedRun(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Double) = {
      val t0 = System.nanoTime()
      val ok = run(fn)
      val sec = (System.nanoTime() - t0) / 1e9
      if (!ok) println(s"""{"metric":"gate_error","name":"$name"}""")
      name -> (if (ok) sec else FailedRunSec)
    }
    val passes = (1 to runsN).map { _ =>
      qs0.map { case (name, fn) => timedRun(name, fn) }
    }
    // ambient hardening for SHORT gates: a sub-3s gate's min-of-2 still
    // swings with one unlucky scheduler stall (the r10/r11 attribution
    // churn lived entirely in this class), while its extra rep costs
    // seconds — so short gates get a third timed rep and report
    // min-of-3. Long gates keep min-of-runsN: their relative noise is
    // smaller and a third rep of a 30s gate is real wall.
    val prelim = qs0.map { case (name, _) =>
      name -> passes.map(_.toMap.apply(name)).min
    }.toMap
    val extra: Map[String, Double] =
      if (runsN < 2) Map.empty
      else qs0.filter { case (name, _) => prelim(name) < 3.0 }
        .map { case (name, fn) => timedRun(name, fn) }.toMap
    val results = qs0.map { case (name, _) =>
      name -> math.min(prelim(name), extra.getOrElse(name, Double.MaxValue))
    }
    def r3(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
        s""""calibration":${r3(calibration)},"queries":$qs,"sf":"$sfDir"}"""
    // The driver captures only a ~2KB tail of stdout; with 80+ queries the
    // per-query map alone exceeds that, so the head of a single long line
    // (including "metric"/"value") gets truncated and nothing parses. Print
    // the detailed line first, then a short summary line LAST — the tail
    // always retains the final line intact, so the driver's parser gets a
    // complete JSON object. Per-query detail also lands in BENCH_FULL.json.
    println(fullLine)
    // ONLY a full-suite run may write the artifact: a name-restricted
    // profiling run overwriting the committed merged-min with a partial
    // map was exactly the round-6 "bench artifact noise" — the file is
    // the full-run record, subsets print to stdout only
    if (only.isEmpty) try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json"))
      java.nio.file.Files.write(out,
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"calibration":${r3(calibration)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
