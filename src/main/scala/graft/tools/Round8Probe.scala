package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 sf1 decade probes for the operators that had never carried a
  * measured 10x row (VERDICT r7 items 3-4): the HLL sketch store's
  * append-vs-recount curve, the corpus publish append path over many
  * admissions, incremental triangle-delta cost vs batch size, and the
  * bucketed graph-store plan assertion at sf1. Gate-level decade ratios
  * (op_profile, td_bigram_xent, the query-library five) come from
  * `graft.Bench <names...>` run at both scale factors — this main covers
  * the curves a single gate timing can't show.
  *
  * Usage: Round8Probe <mode> [sfDir] — mode ∈ hll | publish | tridelta |
  * bucketed. Prints one JSON line per measurement.
  */
object Round8Probe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("hll")
    val sfDir = args.lift(1).getOrElse("/root/repo/bench-data/sf1")
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
    try mode match {
      case "hll" => hllCurve(spark, sfDir)
      case "publish" => publishCurve(spark, sfDir)
      case "tridelta" => triDeltaCurve(spark, sfDir)
      case "tristore" => triStoreCurve(spark, sfDir)
      case "bm25" => bm25Serving(spark, sfDir)
      case "bucketed" => bucketedPlans(spark, sfDir)
      case other => sys.error(s"unknown mode: $other")
    } finally spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Sketch-store admissions: per-batch append cost (register merge vs an
    * nGroups-row table) against the exact-recount alternative whose cost
    * grows with accumulated history.
    */
  private def hllCurve(spark: SparkSession, sfDir: String): Unit = {
    val ev = graft.SparkEntry.readEvents(spark, sfDir)
      .select("event_type", "user_id").cache()
    val n = ev.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_hll").toString
    val nBatches = 8
    val split = abs(hash(col("user_id"), col("event_type"))) % nBatches
    val store = graft.store.SketchStore.build(spark, s"$dir/s",
      ev.where(split === 0), "event_type", "user_id")
    (1 until nBatches).foreach { i =>
      val batch = ev.where(split === i).cache()
      val bn = batch.count()
      val (_, appendS) = timed { store.append(batch) }
      // the recount alternative: exact distinct over everything admitted
      val (_, recountS) = timed {
        ev.where(split <= i).groupBy("event_type")
          .agg(countDistinct("user_id")).collect()
      }
      batch.unpersist()
      println(s"""{"mode":"hll","batch":$i,"batch_rows":$bn,""" +
        s""""append_s":${f(appendS)},"recount_s":${f(recountS)}}""")
    }
    // estimates stay within HLL error of exact after all admissions
    val est = store.estimates.collect()
      .map(r => r.getString(0) -> r.getAs[Number](1).doubleValue()).toMap
    val exact = ev.groupBy(col("event_type").cast("string").as("g"))
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val worst = exact.map { case (g, e) =>
      math.abs(est(g) - e) / math.max(e, 1L) }.max
    println(s"""{"mode":"hll","total_rows":$n,"worst_rel_err":${f(worst)}}""")
    graft.store.GraphStore.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  /** Corpus-store admissions: append cost across many batches (manifest
    * merge is nShards rows — must stay flat), then compact + validate.
    */
  private def publishCurve(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_pub").toString
    val nBatches = 10
    val split = abs(hash(col("doc_id"))) % nBatches
    graft.store.CorpusStore.write(spark, s"$dir/c",
      docs.where(split === 0), "doc_id", "text", nShards = 16)
    (1 until nBatches).foreach { i =>
      val (_, s) = timed {
        graft.store.CorpusStore.append(spark, s"$dir/c",
          docs.where(split === i), "doc_id", "text").collect()
      }
      println(s"""{"mode":"publish","batch":$i,"append_s":${f(s)}}""")
    }
    val nFilesFrag = countFiles(s"$dir/c/docs")
    val (_, compactS) = timed {
      graft.store.CorpusStore.compact(spark, s"$dir/c")
    }
    val nFilesCompact = countFiles(s"$dir/c/docs")
    val (bad, validateS) = timed {
      graft.store.CorpusStore.validate(spark, s"$dir/c", "doc_id", "text")
    }
    val total = graft.store.CorpusStore.manifest(spark, s"$dir/c")
      .agg(sum("n_docs")).head().getLong(0)
    println(s"""{"mode":"publish","n_docs":$total,"frag_files":$nFilesFrag,""" +
      s""""compact_s":${f(compactS)},"compacted_files":$nFilesCompact,""" +
      s""""validate_s":${f(validateS)},"divergent_shards":$bad}""")
    graft.store.GraphStore.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  /** Incremental triangle delta: cost vs new-batch size against the exact
    * full recount, on the sf graph.
    */
  private def triDeltaCurve(spark: SparkSession, sfDir: String): Unit = {
    val edges = graft.SparkEntry.storeFor(spark, sfDir).edges
      .localCheckpoint(true)
    val pcts = sys.env.get("R8_TRI_PCTS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 5, 20))
    if (sys.env.get("R8_TRI_FULL").forall(_ == "1")) {
      val (full, fullS) = timed {
        graft.graph.GraphOps.exactTriangleCount(edges)
      }
      println(s"""{"mode":"tridelta","face":"full_census",""" +
        s""""triangles":$full,"time_s":${f(fullS)}}""")
    }
    for (pct <- pcts) {
      val spl = abs(hash(col("source_id"), col("target_id"))) % 100
      val newE = edges.where(spl < pct)
      val seenE = edges.where(spl >= pct)
      val ((nNew, delta), s) = timed {
        graft.graph.GraphOps.triangleDelta(newE, seenE)
      }
      println(s"""{"mode":"tridelta","new_pct":$pct,"n_new_edges":$nNew,""" +
        s""""delta":$delta,"time_s":${f(s)}}""")
    }
  }

  /** Persisted triangle store at sf1: build once on the seen split, then
    * time per-batch admissions — the floor-free twin of [[triDeltaCurve]]
    * (which re-materializes its seen side every call).
    */
  private def triStoreCurve(spark: SparkSession, sfDir: String): Unit = {
    val edges = graft.SparkEntry.storeFor(spark, sfDir).edges
      .localCheckpoint(true)
    val spl = abs(hash(col("source_id"), col("target_id"))) % 100
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_tri").toString
    val (st, buildS) = timed {
      graft.store.TriangleStore.build(spark, s"$dir/s", edges.where(spl >= 10))
    }
    val (e0, t0) = st.stats
    println(s"""{"mode":"tristore","face":"build","n_edges":$e0,""" +
      s""""n_triangles":$t0,"time_s":${f(buildS)}}""")
    // ten 1%-batches admitted in sequence — steady-state daily ingest
    for (b <- 0 until 10) {
      val ((nNew, delta), s) = timed {
        st.admit(edges.where(spl === b))
      }
      println(s"""{"mode":"tristore","batch":$b,"n_new_edges":$nNew,""" +
        s""""delta":$delta,"time_s":${f(s)}}""")
    }
    val (e1, t1) = st.stats
    println(s"""{"mode":"tristore","face":"final","n_edges":$e1,""" +
      s""""n_triangles":$t1}""")
    graft.store.GraphStore.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  /** BM25 serving split: one-time index build vs per-query cost from the
    * prebuilt index vs the per-query full-corpus batch path — the number
    * the srch_bm25_indexed gate (which builds in-gate for the oracle)
    * can't show.
    */
  private def bm25Serving(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_bm25").toString
    val (st, buildS) = timed {
      graft.store.SearchIndexStore.build(spark, s"$dir/i", docs,
        "doc_id", "text")
    }
    val terms = Seq("spark", "join", "window", "fast")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(st.topK(terms, 20)) // warm
    val qTimes = (1 to 3).map { _ =>
      val (_, s) = timed { noop(st.topK(terms, 20)) }; s
    }
    noop(graft.pipeline.Search.bm25TopK(docs, "doc_id", "text", terms, 20))
    val bTimes = (1 to 3).map { _ =>
      val (_, s) = timed {
        noop(graft.pipeline.Search.bm25TopK(docs, "doc_id", "text", terms, 20))
      }; s
    }
    println(s"""{"mode":"bm25","build_s":${f(buildS)},""" +
      s""""indexed_query_s":${f(qTimes.min)},"batch_query_s":${f(bTimes.min)}}""")
    graft.store.GraphStore.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  /** Bucketed store at sf1: node-edge joins must stay exchange-free on the
    * bucketed layout (StoreScaleSpec proves this at fixture scale; this is
    * the sf1 witness), with the q08-shape join timed on both layouts.
    */
  private def bucketedPlans(spark: SparkSession, sfDir: String): Unit = {
    val store = graft.SparkEntry.storeFor(spark, sfDir)
    val (_, writeS) = timed {
      graft.store.GraphStore.writeBucketed(spark, store, "graft_r8", 32)
    }
    val b = graft.store.GraphStore.readBucketed(spark, "graft_r8")
    def neighborJoin(s: graft.store.GraphStore): DataFrame =
      s.edges.join(s.definitions.withColumnRenamed("id", "source_id"),
        "source_id")
    val plan = neighborJoin(b).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val (nB, tB) = timed { neighborJoin(b).write.format("noop")
      .mode("overwrite").save() }
    val (nC, tC) = timed { neighborJoin(store).write.format("noop")
      .mode("overwrite").save() }
    println(s"""{"mode":"bucketed","write_s":${f(writeS)},""" +
      s""""join_exchanges":$exchanges,"bucketed_join_s":${f(tB)},""" +
      s""""cached_join_s":${f(tC)}}""")
  }

  private def countFiles(dir: String): Int = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.count(p => p.toString.endsWith(".parquet"))
    } finally s.close()
  }

  private def f(d: Double): String = "%.3f".format(d)
}
