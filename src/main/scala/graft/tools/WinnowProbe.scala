package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Scaling probe for the winnowing overlap census: times
  * [[Dedup.winnowOverlap]] uncapped vs df-capped on the same corpus, with
  * an optional corpus-wide boilerplate footer (`boiler=1`) — a fingerprint
  * selected by d documents contributes d² census rows, the same heavy-tail
  * failure mode as the containment census, and the cap bounds it at cap².
  * Feeds SCALE.md's round-7 table.
  *
  * Usage: WinnowProbe <docsDir> [dfCap=20] [boiler=0]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench-data/sf1")
    val cap = args.lift(1).map(_.toLong).getOrElse(20L)
    val boiler = args.lift(2).contains("1")
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
      concat(col("text"), lit(" this corpus wide footer sentence appears " +
        "verbatim at the end of every single document")))
    val runs: Seq[(String, () => Long)] = Seq(
      "uncapped" -> (() => Dedup.winnowOverlap(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2).count()),
      s"dfCap=$cap" -> (() => Dedup.winnowOverlap(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2, dfCap = cap).count()))
    runs.foreach { case (label, run) =>
      val t0 = System.nanoTime()
      val n = run()
      println(f"[probe] winnow $label%-12s pairs=$n " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
