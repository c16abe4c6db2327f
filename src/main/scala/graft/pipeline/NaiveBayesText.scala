package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.{charFold, shingleList}

/** Multinomial Naive Bayes text classifier over hashed n-gram features —
  * the trainable-classifier step of a data pipeline (language ID, quality
  * tiers, topic routing) in a form that stays inside the engine's
  * determinism contract: fitting is closed-form counting (no iterative
  * optimizer, no RNG), so both training and prediction replay exactly in
  * the DuckDB oracle. The multiclass generalization of [[Dsir]]'s
  * two-distribution machinery, sharing its feature space (unigram+bigram
  * occurrences folded into `buckets` buckets by the cross-engine hash).
  *
  * score(d, c) = ln prior(c) + Σ_b cnt_d[b] · ln p(b|c),   add-1 smoothed;
  * prediction is argmax over classes on the 4dp-rounded score, ties broken
  * by label — deterministic on every engine.
  *
  * Scale shape: the fitted model is `buckets × classes` rows (a few
  * thousand doubles) riding a broadcast; training is the same single
  * explode+count exchange DSIR uses (ReuseExchange shares it with the
  * scoring branch when train and predict run in one plan); prediction is a
  * map-side broadcast join + per-(doc, class) partial aggregation. No
  * per-document inference service — the classifier IS a DataFrame program.
  */
object NaiveBayesText {

  private def grams(textCol: Column): Column =
    concat(shingleList(textCol, 1), shingleList(textCol, 2))

  /** Per-(doc, label, bucket) n-gram occurrence counts. `labelCol` is the
    * supervision column on train rows and rides along (unused) on predict
    * rows.
    */
  private def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
                           labelCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol), col(labelCol).as("__lbl"),
        explode(grams(col(textCol))).as("__g"))
      .select(col(idCol), col("__lbl"),
        (charFold(col("__g")) % buckets).as("__b"))
      .groupBy(idCol, "__lbl", "__b").agg(count(lit(1)).as("__c"))

  /** Class-conditional log-probabilities fitted on `train`:
    * (__lbl, __b, __lp) with add-1 smoothing over the bucket space, plus a
    * priors frame (__lbl, __prior, __absent) where __absent is the class's
    * smoothed log-prob ln(1/(ctot+B)) for buckets unseen in its training
    * counts. Both bounded by classes (× buckets), never by corpus size.
    */
  def fit(train: DataFrame, idCol: String, textCol: String,
          labelCol: String, buckets: Int = 1024)
      : (DataFrame, DataFrame) = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // model + per-class totals both consume the count table — materialize
    // it once (the withXentBuckets pattern) instead of tokenizing twice
    val cnts = bucketCounts(train, idCol, textCol, labelCol, buckets)
      .localCheckpoint(true)
    val perClassBucket = cnts.groupBy("__lbl", "__b")
      .agg(sum("__c").as("__cc"))
    val perClass = perClassBucket.groupBy("__lbl")
      .agg(sum("__cc").as("__ctot"))
    val model = perClassBucket.join(broadcast(perClass), "__lbl")
      .select(col("__lbl"), col("__b"),
        (log(col("__cc") + 1) - log(col("__ctot") + buckets)).as("__lp"))
    val nTrain = train.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__n"))
    val priors = nTrain.crossJoin(
        broadcast(nTrain.agg(sum("__n").as("__tot"))))
      .join(broadcast(perClass), Seq("__lbl"), "left")
      .select(col("__lbl"),
        (log(col("__n")) - log(col("__tot"))).as("__prior"),
        (-log(coalesce(col("__ctot"), lit(0L)) + buckets)).as("__absent"))
    (model, priors)
  }

  /** Predict a label for every document: adds `predicted` and the rounded
    * winning `nb_score`. Documents with no tokens fall back to the prior
    * argmax. `priors` must carry (__lbl, __prior, __absent) where __absent
    * is the class's smoothed log-prob ln(1/(ctot+B)) for buckets unseen in
    * its training counts.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, priors: DataFrame,
              buckets: Int = 1024): DataFrame = {
    // docs → (id, bucket, cnt), label-free
    val cnts = docs.select(col(idCol), explode(grams(col(textCol))).as("__g"))
      .select(col(idCol), (charFold(col("__g")) % buckets).as("__b"))
      .groupBy(idCol, "__b").agg(count(lit(1)).as("__c"))
    val classes = priors.select("__lbl", "__prior", "__absent")

    // score the SEEN buckets against each class; buckets absent from a
    // class's model contribute the class's absent-bucket mass instead
    val joined = cnts.crossJoin(broadcast(classes))
      .join(broadcast(model), Seq("__lbl", "__b"), "left")
      .withColumn("__term",
        col("__c") * coalesce(col("__lp"), col("__absent")))
    val perDocClass = joined.groupBy(idCol, "__lbl", "__prior")
      .agg(sum("__term").as("__s"))
      .select(col(idCol), col("__lbl"),
        round(col("__prior") + col("__s"), 4).as("nb_score"))
    // token-less docs: prior-only score for every class
    val bare = docs.select(col(idCol)).except(
        perDocClass.select(col(idCol)))
      .crossJoin(broadcast(classes.select(col("__lbl"),
        round(col("__prior"), 4).as("nb_score"))))
    val all = perDocClass.unionByName(bare)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("nb_score").desc, col("__lbl"))
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__lbl").as("predicted"), col("nb_score"))
  }

  /** Fit on the deterministic id-hash train split and predict every
    * document; returns (id, labelCol, predicted, nb_score). The one-call
    * shape the gates use.
    */
  def fitPredict(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, trainPct: Int = 50,
                 buckets: Int = 1024): DataFrame = {
    val train = Sampling.hashPercent(docs, col(idCol), trainPct)
    val (model, priors) = fit(train, idCol, textCol, labelCol, buckets)
    predict(docs, idCol, textCol, model, priors, buckets)
      .join(docs.select(col(idCol), col(labelCol)), idCol)
      .select(col(idCol), col(labelCol), col("predicted"), col("nb_score"))
  }

  /** Confusion matrix of a prediction frame: (label, predicted, n). */
  def confusion(pred: DataFrame, labelCol: String): DataFrame =
    pred.groupBy(col(labelCol), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
