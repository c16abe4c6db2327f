package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.GraphOps
import graft.tpch.TpchGraphAdapter

/** sf1 cost/error probe for the estimator-only DOULION face: times the
  * exact degree-ordered census and [[GraphOps.doulionEstimate]] (sample →
  * orient → count, no exact branch) on the same graph and prints
  * (exact_s, est_s, rel_err) — pinning the claimed ~p³ estimator cost that
  * the `g_triangles_approx` gate (which deliberately runs BOTH faces as its
  * in-query error audit) cannot show on its own. Feeds SCALE.md.
  *
  * Usage: TriangleProbe [sfDir] [pPercent]
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench-data/sf1")
    val pPercent = args.lift(1).map(_.toInt).getOrElse(20)
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

    val edges = TpchGraphAdapter(spark, dir).cacheAll().edges
    edges.count() // materialize the store cache outside both timings

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, exactS) = timed(GraphOps.exactTriangleCount(edges))
    val (row, estS) = timed(GraphOps.doulionEstimate(edges, pPercent).head())
    val est = row.getAs[Long]("est_triangles")
    val relErr = math.abs(est - exact).toDouble / math.max(1L, exact)
    println(f"[probe] triangles dir=$dir p=$pPercent%% " +
      f"exact=$exact (${exactS}%.1f s) est=$est (${estS}%.1f s) " +
      f"rel_err=$relErr%.4f est_cost_frac=${estS / exactS}%.3f")
    spark.stop()
  }
}
