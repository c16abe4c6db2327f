package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV (bottom-k) sketch: the set-operation member of the sketch family.
  * Pins the estimator's exact-regime identity, the merge law (bottom-k of
  * a union == bottom-k of merged synopses), and the intersection
  * estimator's boundary cases — the integer arithmetic these share with
  * the DuckDB oracle is what the sk_kmv_* gates hash-compare.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def items(xs: Seq[String]) = xs.toDF("item")

  test("below k the sketch is exhaustive and the estimate exact") {
    val df = items(Seq("a", "b", "c", "b", "a"))
    val sk = Sketches.kmv(df, "item", k = 16)
    assert(sk.count() == 3)
    val row = Sketches.kmvCardinality(sk, 16).head()
    assert(row.getLong(0) == 3 && row.getLong(2) == 3)
  }

  test("merge of split synopses equals the one-shot sketch") {
    val xs = (1 to 500).map(i => s"tok$i")
    val (even, odd) = xs.partition(_.length % 2 == 0)
    val k = 32
    val oneShot = Sketches.kmv(items(xs), "item", k).as[Long].collect().sorted
    val merged = Sketches.kmvMerge(k,
        Sketches.kmv(items(even), "item", k),
        Sketches.kmv(items(odd), "item", k))
      .as[Long].collect().sorted
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("estimate is within KMV error bounds on a 5k universe") {
    val xs = (1 to 5000).map(i => s"word-$i-x")
    val k = 256
    val est = Sketches.kmvCardinality(Sketches.kmv(items(xs), "item", k), k)
      .head().getLong(2)
    // std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est=$est")
  }

  test("intersection estimator: identical sets give jaccard 1") {
    val xs = (1 to 1000).map(i => s"t$i")
    val k = 64
    val a = Sketches.kmv(items(xs), "item", k)
    val row = Sketches.kmvIntersect(a, a, k).head()
    val (kU, matched, estU, estI) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(kU == k && matched == kU && estI == estU)
  }

  test("intersection estimator tracks a known 50% overlap") {
    // A = 1..2000, B = 1001..3000 — |A∩B| = 1000, |A∪B| = 3000
    val a = (1 to 2000).map(i => s"item$i")
    val b = (1001 to 3000).map(i => s"item$i")
    val k = 256
    val row = Sketches.kmvIntersect(
      Sketches.kmv(items(a), "item", k),
      Sketches.kmv(items(b), "item", k), k).head()
    val estI = row.getLong(3)
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.5, s"estI=$estI")
    assert(estI <= row.getLong(2)) // never exceeds the union estimate
  }
}
