package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[NaiveBayesText]] — closed-form multinomial NB over hashed n-grams.
  * Oracle-gated end-to-end in `nb_langid_predict` / `nb_confusion`; this
  * spec asserts what the gates cannot: separable classes classify
  * perfectly, prediction is deterministic, and the model rides a
  * broadcast.
  */
class NaiveBayesTextSpec extends SparkSpec {

  // two cleanly separable vocabularies; ids chosen so the 50% id-hash
  // train split leaves at least one train doc per class
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "code", "def parse tree returns node list for each branch"),
      (2L, "code", "class loader compiles byte code into method tables"),
      (3L, "code", "function scope binds variable names to stack slots"),
      (4L, "code", "compiler emits byte code for each method body"),
      (5L, "prose", "the river wandered slowly through morning mist"),
      (6L, "prose", "she walked beneath the autumn trees at dusk"),
      (7L, "prose", "a quiet rain fell over the sleeping village"),
      (8L, "prose", "the mountain path curved gently toward the valley"),
      (9L, "code", ""), // token-less: prior-only fallback
    ).toDF("doc_id", "label", "text")
  }

  test("nb: separable vocabularies classify correctly; empty text falls " +
    "back to the prior argmax") {
    val pred = NaiveBayesText.fitPredict(docs, "doc_id", "text", "label",
        trainPct = 60, buckets = 128)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted")).toMap
    assert(pred.size == 9)
    (1L to 4L).foreach(id => assert(pred(id) == "code",
      s"doc $id predicted ${pred(id)}: $pred"))
    (5L to 8L).foreach(id => assert(pred(id) == "prose",
      s"doc $id predicted ${pred(id)}: $pred"))
    // doc 9 gets SOME deterministic class from the priors (value depends
    // on the split, but it must be stable across runs)
    val again = NaiveBayesText.fitPredict(docs, "doc_id", "text", "label",
        trainPct = 60, buckets = 128)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted")).toMap
    assert(pred == again)
  }

  test("nb plan: model and priors broadcast; no corpus self shuffle join") {
    val pred = NaiveBayesText.fitPredict(docs, "doc_id", "text", "label",
      trainPct = 60, buckets = 128)
    pred.collect()
    val plan = pred.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"model should ride a broadcast:\n$plan")
  }
}
