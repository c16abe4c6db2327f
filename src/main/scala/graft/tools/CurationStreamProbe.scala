package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the td_curation_stream gate body — where does a
  * composed streaming-admission gate actually spend its wall time at
  * sf0.1? (index build / batch 1 / batch 2 / read-back audit)
  */
object CurationStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"phase":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_cstr_probe_" +
      ProcessHandle.current().pid()
    val idx = timed("index_build") {
      graft.store.DedupIndexStore.build(spark, s"$base/idx",
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    }
    timed("corpus_seed") {
      graft.store.CorpusStore.write(spark, s"$base/pub",
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text", nShards = 8)
    }
    val bench = docs.where(col("doc_id") < 10)
    for (parity <- Seq(0L, 1L)) {
      val batch =
        docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === parity)
      val stageFn = { (name: String) => (df: org.apache.spark.sql.DataFrame) =>
        val p = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val t0 = System.nanoTime()
        val nn = p.count()
        println(f"""{"phase":"b${parity}_stage_$name","rows":$nn,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        p
      }
      val survivors = timed(s"b${parity}_cleanedPlan") {
        graft.pipeline.CurationPipeline.cleanedPlan(batch, "doc_id", "text",
            bench, "text", idx, graft.pipeline.CurationPipeline.Config(),
            stageFn)
          .select("doc_id", "text").localCheckpoint(true)
      }
      timed(s"b${parity}_count")(survivors.count())
      timed(s"b${parity}_corpus_append") {
        graft.store.CorpusStore.append(spark, s"$base/pub", survivors,
          "doc_id", "text")
      }
      timed(s"b${parity}_index_append") {
        idx.append(survivors, "doc_id", "text")
      }
    }
    timed("audit") {
      val intact = graft.store.CorpusStore.validate(
        spark, s"$base/pub", "doc_id", "text") == 0
      val sums = graft.store.CorpusStore.docs(spark, s"$base/pub")
        .groupBy("shard")
        .agg(sum(graft.functions.TextFunctions.charFold(col("text")))
          .as("checksum"))
      graft.store.CorpusStore.manifest(spark, s"$base/pub")
        .join(sums, Seq("shard"))
        .withColumn("intact", lit(intact))
        .orderBy("shard").collect().length
    }
    graft.SparkEntry.registerTmpCleanup(s"$base/idx")
    graft.SparkEntry.registerTmpCleanup(s"$base/pub")
    spark.stop()
  }
}
