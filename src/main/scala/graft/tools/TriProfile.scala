package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13: decompose the exact triangle census (g_triangles' body) —
  * sizes (edges, wedges, triangles) and timed A/B of the closing-edge
  * membership probe as SMJ (status quo: the full wedge set is exchanged +
  * sorted) vs broadcast hash (the wedge set never shuffles; the oriented
  * edge list, 3 longs/row, is the build side).
  */
object TriProfile {
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
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"""{"metric":"tri_prof","case":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    val st = graft.SparkEntry.storeFor(spark, sfDir)
    st.edges.count()
    val und = graft.graph.GraphOps.canonicalUndirected(st.edges)
      .localCheckpoint(true)
    println(s"""{"metric":"tri_prof","n_und":${und.count()}}""")
    val deg = und.select(explode(array(col("u"), col("v"))).as("vid"))
      .groupBy("vid").agg(count(lit(1)).as("dg"))
    val dir = und
      .join(deg.select(col("vid").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("vid").as("v"), col("dg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint(true)
    println(s"""{"metric":"tri_prof","n_dir":${dir.count()}}""")
    def wedges = dir.as("e1")
      .join(dir.as("e2"), col("e2.s") === col("e1.s") &&
        (col("e1.dt") < col("e2.dt") ||
          (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("x"), col("e1.t").as("y"), col("e2.t").as("z"))
    timed("wedge_count_only") {
      println(s"""{"metric":"tri_prof","n_wedges":${wedges.count()}}""")
    }
    (1 to 2).foreach { r =>
      timed(s"census_smj_$r") {
        val t = wedges
          .join(dir.select(col("s").as("y"), col("t").as("z")), Seq("y", "z"))
          .count()
        println(s"""{"metric":"tri_prof","n_tri":$t}""")
      }
      timed(s"census_bhj_$r") {
        val t = wedges
          .join(broadcast(dir.select(col("s").as("y"), col("t").as("z"))),
            Seq("y", "z"))
          .count()
        println(s"""{"metric":"tri_prof","n_tri_bhj":$t}""")
      }
    }
    spark.stop()
  }
}
