package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session factory. local[N] for tests/bench; on a real cluster
  * the same configs apply except master/shuffle partitions, which come from
  * the deploy environment.
  */
object Sessions {
  def local(cores: Int = 32, app: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
