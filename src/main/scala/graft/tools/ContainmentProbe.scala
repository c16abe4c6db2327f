package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Scaling probe for the containment pair census: times
  * [[Dedup.containmentPairs]] uncapped vs df-capped on the same corpus.
  * The uncapped inverted-index self-join pays df² rows per shingle — on a
  * corpus with cross-document half-sharing that is the super-linear curve
  * SCALE.md's sf1 decade measured; the cap bounds per-shingle fanout at
  * cap² and changes the semantics to containment over the capped shingle
  * space (boilerplate-only overlap stops counting), the documented
  * production discipline.
  *
  * Usage: ContainmentProbe <docsDir> [threshold=0.8] [dfCap=20] [boiler=0]
  * boiler=1 appends a constant footer to EVERY document — the heavy-tail
  * df distribution (universal boilerplate) that the direct census pays
  * df² for and the prefix filter is immune to (max-df shingles sort last
  * and never become probe keys).
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench-data/sf1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val cap = args.lift(2).map(_.toLong).getOrElse(20L)
    val boiler = args.lift(3).contains("1")
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

    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val docs = if (!boiler) raw else raw.withColumn("text",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.lit(" this corpus wide footer " +
          "sentence appears verbatim at the end of every single document")))
    val runs: Seq[(String, () => Long)] = Seq(
      "uncapped" -> (() => Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = threshold).count()),
      s"dfCap=$cap" -> (() => Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = threshold, dfCap = cap).count()),
      "prefix" -> (() => Dedup.containmentPairsPrefix(docs, "doc_id", "text",
        n = 3, threshold = threshold).count()))
    runs.foreach { case (label, run) =>
      val t0 = System.nanoTime()
      val n = run()
      println(f"[probe] $label%-12s pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
