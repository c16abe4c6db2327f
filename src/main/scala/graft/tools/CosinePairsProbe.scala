package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Dedup, Similarity}

/** Scaling probe for the embedding-cosine near-dup candidate generator:
  * times [[Dedup.embeddingCosinePairs]] under (a) the gates' fixed
  * (bits=3, tables=32) parameters and (b) [[Similarity.lshPlanFor]]'s
  * corpus-sized plan, and cross-checks that the two parameterizations'
  * verified pair counts agree within the plan's designed 1e-4 per-pair miss
  * budget (both are candidates-then-exact-verify, so a larger divergence is
  * a recall bug in one of them).
  *
  * Usage: CosinePairsProbe <embeddingsDir> [threshold=0.45]
  * Feeds the SCALE.md sf1 table; see the round-6 section there.
  */
object CosinePairsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench-data/sf1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.45)
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

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val plan = Similarity.lshPlanFor(n, threshold)
    val settings = Seq("fixed" -> (3, 32), "planned" -> plan)

    val results = settings.map { case (label, (bits, tables)) =>
      val t0 = System.nanoTime()
      // the planned branch calls the DEFAULT signature (bits = tables = 0 →
      // lshPlanFor inside the operator) so the probe measures the wiring
      // users actually get, not a hand-passed equivalent
      val pairs =
        if (label == "planned")
          Dedup.embeddingCosinePairs(e, "vec_id", "embedding", threshold)
        else Dedup.embeddingCosinePairs(e, "vec_id", "embedding",
          threshold, dim = 64, bits = bits, tables = tables)
      val cnt = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-8s bits=$bits%2d tables=$tables%3d " +
        f"n=$n pairs=$cnt time=$secs%.1f s")
      (label, bits, tables, cnt, secs)
    }
    // the plan promises per-pair miss <= 1e-4, so the two counts may differ
    // by a hair; flag only a delta beyond 5x that budget (a real recall bug)
    val counts = results.map(_._4)
    val delta = (counts.max - counts.min).toDouble / math.max(1L, counts.max)
    if (delta <= 5e-4)
      println(f"[probe] pair sets agree within the miss budget " +
        f"(delta ${counts.max - counts.min} of ${counts.max}, ${delta}%.2e)")
    else println(s"[probe] PAIR-COUNT MISMATCH beyond miss budget: $results")
    spark.stop()
  }
}
