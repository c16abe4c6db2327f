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

  test("KmvStore: admissions (one replayed) equal the one-shot sketch; " +
       "rebuild equals build-from-survivors") {
    val xs = (1 to 3000).map(i => s"kv$i")
    val k = 64
    val dir = java.nio.file.Files.createTempDirectory("graft-kmvstore")
      .toString
    val batches = xs.grouped(1000).toSeq // 3 batches
    val st = graft.store.KmvStore.build(spark, dir, items(batches(0)),
      "item", k)
    st.admit(items(batches(1)))
    st.admit(items(batches(1))) // replay: idempotent
    st.admit(items(batches(2)))
    val oneShot = Sketches.kmv(items(xs), "item", k)
      .as[Long].collect().sorted.toSeq
    assert(st.synopsis.as[Long].collect().sorted.toSeq == oneShot)
    // deletion contract: no retire — rebuild from survivors, bit-identical
    // to a fresh build over the same survivors
    val survivors = xs.take(1000)
    st.rebuild(items(survivors))
    val fresh = Sketches.kmv(items(survivors), "item", k)
      .as[Long].collect().sorted.toSeq
    assert(st.synopsis.as[Long].collect().sorted.toSeq == fresh)
    // intersect face against an independent synopsis
    val other = Sketches.kmv(items(xs.take(500)), "item", k)
    val row = st.intersect(other).head()
    assert(row.getLong(1) > 0 && row.getLong(3) <= row.getLong(2))
  }

  test("StreamingKmv admits micro-batches into the persisted synopsis") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmvstream")
    val src = dir.resolve("src"); val store = dir.resolve("st").toString
    java.nio.file.Files.createDirectories(src)
    val xs = (1 to 800).map(i => s"sv$i")
    graft.store.KmvStore.build(spark, store, items(Seq.empty[String]),
      "item", 32)
    items(xs).coalesce(1).write.mode("overwrite").json(src.toString)
    val stream = spark.readStream
      .schema("item STRING").json(src.toString)
    val q = graft.stream.StreamingKmv.start(stream, store, triggerMs = 100L)
    try q.processAllAvailable() finally q.stop()
    val got = new graft.store.KmvStore(store, spark)
      .synopsis.as[Long].collect().sorted.toSeq
    val oneShot = Sketches.kmv(items(xs), "item", 32)
      .as[Long].collect().sorted.toSeq
    assert(got == oneShot)
  }
}
