package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Dsir]] — importance resampling (Xie et al. 2023). The oracle-gated
  * behavior lives in the `dsir_weights` / `dsir_resample` gates; this spec
  * asserts the semantics a gate cannot express (direction of the weights,
  * determinism, broadcast plan shape).
  */
class DsirSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "en", "the quick brown fox jumps over the lazy dog"),
      (1L, "en", "the quick brown fox naps beside the lazy dog"),
      (2L, "en", "quick brown foxes and lazy dogs share a field"),
      (3L, "de", "der schnelle braune fuchs springt uber den faulen hund"),
      (4L, "de", "vollig anderer inhalt uber maschinen und anlagen"),
      (5L, "de", "the quick brown fox jumps over the lazy dog"), // en-like text
      (6L, "en", "")
    ).toDF("doc_id", "lang", "text")
  }

  test("dsir: target-like text scores above target-unlike text") {
    val w = Dsir.withImportance(docs, "doc_id", "text",
        col("lang") === "en", buckets = 64)
      .select("doc_id", "dsir_logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // doc 5 has ENGLISH text labeled de: its hashed-ngram profile matches
    // the en model, so it must outscore the genuinely German docs — the
    // whole point of importance weighting over provenance labels
    assert(w(5L) > w(3L), s"en-like text under-scored: $w")
    assert(w(5L) > w(4L), s"en-like text under-scored: $w")
    // target members score above non-members on average
    val enAvg = Seq(0L, 1L, 2L).map(w).sum / 3
    val deAvg = Seq(3L, 4L).map(w).sum / 2
    assert(enAvg > deAvg, s"target subset not favored: en=$enAvg de=$deAvg")
    // token-less doc is exactly neutral
    assert(w(6L) == 0.0)
  }

  test("dsir: resample is deterministic and ordered by weight") {
    val a = Dsir.resample(docs, "doc_id", "text",
      col("lang") === "en", k = 3, buckets = 64).select("doc_id").collect()
    val b = Dsir.resample(docs, "doc_id", "text",
      col("lang") === "en", k = 3, buckets = 64).select("doc_id").collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.length == 3)
  }

  test("dsir plan: bucket models broadcast; scoring never shuffle-joins " +
    "the corpus against itself") {
    val w = Dsir.withImportance(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64)
    w.collect()
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"model should ride a broadcast:\n$plan")
  }
  test("dsir: literal-model scoring agrees with the distributed pipeline") {
    import org.apache.spark.sql.functions.col
    val arr = Dsir.fitModelArray(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64)
    assert(arr.length == 64)
    val viaArray = docs.withColumn("w",
        Dsir.scoreAgainst(arr, col("text")))
      .select("doc_id", "w").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaPipeline = Dsir.withImportance(docs, "doc_id", "text",
        col("lang") === "en", buckets = 64)
      .select("doc_id", "dsir_logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaPipeline.foreach { case (id, w) =>
      assert(math.abs(viaArray(id) - w) <= 0.0011, // both 4dp-rounded
        s"doc $id: array=$viaArray(id) pipeline=$w")
    }
  }

}
