package graft
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "explain")
    val d = "/root/testdata/sf0.01"
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    dump("s5_scan_pushdown", SparkEntry.queries("s5_scan_pushdown")(spark, d))
    dump("join_revenue", SparkEntry.queries("join_revenue_by_nation")(spark, d))
    dump("q04_file_definitions", SparkEntry.queries("q04_file_definitions")(spark, d))
    dump("dd_minhash", SparkEntry.queries("dd_minhash_lsh")(spark, d))
    spark.stop()
  }
}
