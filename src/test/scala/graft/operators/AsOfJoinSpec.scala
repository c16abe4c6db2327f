package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right row at or before left ts, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, t("2024-01-01 10:00:05"), "T1"),
      (1L, t("2024-01-01 10:00:30"), "T2"),
      (2L, t("2024-01-01 10:00:10"), "T3"),
      (2L, t("2024-01-01 09:59:00"), "T4") // before any quote → dropped (inner)
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0),
      (1L, t("2024-01-01 10:00:30"), 101.0), // equal ts → matches T2
      (2L, t("2024-01-01 10:00:00"), 200.0)
    ).toDF("k", "qts", "px")
    val out = AsOfJoin.backward(trades, quotes, "k", "ts", "qts",
      Seq("px" -> "px", "qts" -> "qts"))
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("T1" -> 100.0, "T2" -> 101.0, "T3" -> 200.0))
  }

  test("forward as-of picks earliest right row at or after left ts, per key") {
    import spark.implicits._
    val purchases = Seq(
      (1L, t("2024-01-01 10:00:05"), "P1"),
      (1L, t("2024-01-01 10:00:30"), "P2"), // equal ts → matches C2
      (2L, t("2024-01-01 10:00:10"), "P3") // after all clicks → dropped (inner)
    ).toDF("k", "ts", "p")
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:10"), "C1"),
      (1L, t("2024-01-01 10:00:30"), "C2"),
      (2L, t("2024-01-01 10:00:00"), "C3")
    ).toDF("k", "cts", "c")
    val out = AsOfJoin.forward(purchases, clicks, "k", "ts", "cts",
      Seq("c" -> "c")).select("p", "c").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("P1" -> "C1", "P2" -> "C2"))
  }

  test("outer variant keeps unmatched left rows with null") {
    import spark.implicits._
    val l = Seq((1L, t("2024-01-01 00:00:00"), "a")).toDF("k", "ts", "v")
    val r = Seq((1L, t("2024-01-02 00:00:00"), 9.0)).toDF("k", "rts", "px")
    val out = AsOfJoin.backward(l, r, "k", "ts", "rts",
      Seq("px" -> "px"), inner = false).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("px")))
  }
}
