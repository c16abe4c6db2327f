package graft

/** Driver-contract smoke: SparkEntry.entry must return >0 rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "entry-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"entry_rows":$n}""")
    spark.stop()
    require(n > 0, "entry returned no rows")
  }
}
