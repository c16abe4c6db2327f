package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 hypothesis probe: the text-heavy dedup/curation operators read
  * documents.parquet as ONE input partition (the sf0.1 file is 580 KB — far
  * under maxPartitionBytes), so their per-row-expensive work (shingling,
  * MinHash, array_intersect verify) runs near-serially, and AQE's
  * byte-based coalescing keeps downstream stages at 1-2 tasks because the
  * shuffled bytes are tiny relative to their CPU cost. Measures A/B:
  * operator over the raw read vs over a defaultParallelism repartition.
  */
object FanOutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"""{"metric":"fanout_probe","case":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fanned = docs.repartition(spark.sparkContext.defaultParallelism)
    println(s"""{"metric":"fanout_probe","raw_partitions":${docs.rdd.getNumPartitions},"rows":${docs.count()}}""")
    // warm both
    docs.write.format("noop").mode("overwrite").save()
    fanned.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { r =>
      timed(s"containment_raw_$r") {
        graft.pipeline.Dedup.containmentPairsPrefix(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"containment_fanned_$r") {
        graft.pipeline.Dedup.containmentPairsPrefix(fanned, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
    }
    // A/B: AQE partition coalescing off (joins still adaptive) — does the
    // byte-based coalescing serialize the CPU-heavy string stages?
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    (1 to 2).foreach { r =>
      timed(s"containment_nocoalesce_$r") {
        graft.pipeline.Dedup.containmentPairsPrefix(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // ---- stage decomposition over the fanned input: where do the seconds
    //      live? (shingle+prefix build vs candidate distinct vs verify)
    import graft.functions.TextFunctions.shingleSet
    import org.apache.spark.sql.expressions.Window
    val n = 3; val threshold = 0.8
    val sets = fanned.select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .persist()
    timed("s1_sets")(sets.write.format("noop").mode("overwrite").save())
    val shd = sets.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle")).persist()
    timed("s2_explode")(shd.write.format("noop").mode("overwrite").save())
    val dfreq = shd.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val prefix = shd.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("n_sh"), col("shingle")).persist()
    timed("s3_prefix")(prefix.write.format("noop").mode("overwrite").save())
    val candidates = prefix.alias("p")
      .join(shd.alias("f"), col("p.shingle") === col("f.shingle") &&
        (col("p.n_sh") < col("f.n_sh") ||
          (col("p.n_sh") === col("f.n_sh") &&
            col("p.doc_id") < col("f.doc_id"))))
      .select(least(col("p.doc_id"), col("f.doc_id")).as("id_a"),
        greatest(col("p.doc_id"), col("f.doc_id")).as("id_b"))
      .distinct().persist()
    timed("s4_candidates")(candidates.write.format("noop").mode("overwrite").save())
    println(s"""{"metric":"fanout_probe","n_candidates":${candidates.count()}}""")
    timed("s5_verify") {
      candidates
        .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
        .where(greatest(col("c").cast("double") / size(col("sha")),
          col("c").cast("double") / size(col("shb"))) >= threshold)
        .write.format("noop").mode("overwrite").save()
    }
    timed("s5_verify_repart") {
      candidates.repartition(spark.sparkContext.defaultParallelism)
        .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
        .where(greatest(col("c").cast("double") / size(col("sha")),
          col("c").cast("double") / size(col("shb"))) >= threshold)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
