package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus search / statistical-LM scoring over the documents table — the
  * retrieval and quality-filter faces of a training-data pipeline.
  *
  * Everything is deterministic and engine-replayable: scores round to 4
  * decimals BEFORE ranking (a raw double's last ulp may differ between
  * engines' `ln`; ranking on the rounded value with a doc-id tiebreak keeps
  * the top-k hash-stable), and every aggregate is an equi-shuffle on the
  * term or the document id — the inverted-index shape, no pairwise joins.
  */
object Search {

  /** Okapi BM25 top-k for a bag-of-words query.
    *
    * Plan shape: tokenize map-side → explode only the tokens that match a
    * broadcast query-term array → tf = one shuffle on (doc, term) → df =
    * one aggregation on term (vocabulary-sized, broadcast back) → score
    * map-side → TopK window. At 100 TB the only corpus-sized shuffle is
    * the (doc, term) tf aggregation, keyed fine-grained; df and the
    * (n_docs, avgdl) scalars are broadcast.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qArr = array(queryTerms.distinct.map(lit): _*)
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // corpus scalars ride along via a broadcast 1-row cross join (stays in
    // the plan; no driver-side collect)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val hits = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => array_contains(qArr, t))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val df = hits.groupBy("term")
      .agg(countDistinct("doc_id").cast("double").as("df"))
    val scored = hits.join(broadcast(df), "term")
      .join(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("contrib"), 4).as("score"))
    // TakeOrderedAndProject first (distributed top-k — never a global
    // single-partition rank over every matching doc), then number the k
    // survivors
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("doc_id", "score", "rank")
  }

  /** Reciprocal-rank fusion (Cormack & Clarke's RRF) of two ranked lists —
    * the standard hybrid-retrieval combiner: rrf(d) = Σ_lists 1/(k0 +
    * rank_list(d)), with a document absent from a list contributing 0.
    * Inputs are (doc_id, rank) frames; returns the fused top-k as
    * (doc_id, rrf, rank).
    *
    * Determinism: ranks are small exact integers, so 1/(k0+rank) is one
    * IEEE division both engines round identically, and the two-term sum has
    * a fixed operand order (lex + sem); the fused score is rounded before
    * ranking with a doc-id tiebreak, the same discipline as every other
    * ranked gate here.
    *
    * Scale shape: each input list is already a bounded top-N (produced by a
    * distributed top-k), so the fusion join touches 2·N rows regardless of
    * corpus size — the expensive work lives in the upstream rankers.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k0: Int = 60,
              k: Int = 20): DataFrame = {
    val l = lex.select(col("doc_id"), col("rank").as("lex_rank"))
    val s = sem.select(col("doc_id"), col("rank").as("sem_rank"))
    val fused = l.join(s, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("sem_rank")), lit(0.0)), 6))
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("doc_id", "rrf", "rank")
  }

  /** Hybrid retrieval: BM25 over the text column fused (RRF) with exact
    * embedding-cosine ranking against a query vector, the two lists the
    * modern retrieval stack combines. `docs` and `embs` share an id space
    * (doc_id = vec_id); the query is (bag of terms, the embedding of
    * `queryVecId`), and each side contributes its top `perList` before
    * fusion. The semantic side here is the exact brute-force ranker — at
    * scale swap in [[Similarity.lshTopK]]/[[Similarity.ivfTopK]], which
    * return the same (query_id, neighbor_id, rank) shape.
    */
  def hybridTopK(docs: DataFrame, embs: DataFrame, docId: String,
                 textCol: String, vecId: String, vecCol: String,
                 queryTerms: Seq[String], queryVecId: Long,
                 perList: Int = 50, k0: Int = 60, k: Int = 20): DataFrame = {
    val lex = bm25TopK(docs, docId, textCol, queryTerms, k = perList)
      .select("doc_id", "rank")
    val sem = Similarity.bruteForceTopK(
        embs.where(col(vecId) === queryVecId), embs, vecId, vecCol,
        k = perList)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(lex, sem, k0, k)
  }

  /** Top-k TF-IDF keyword extraction per document — the classic corpus
    * signal behind keyword indexing and topic-drift monitoring in a
    * training-data pipeline. score(d, t) = tf(d, t) · ln(N / df(t)),
    * rounded BEFORE ranking (see the object scaladoc), ties broken by term.
    *
    * Plan shape: one (doc, term) tf shuffle; df is a vocabulary-sized
    * aggregation OF tf (not a second corpus scan) broadcast back; the
    * per-document rank window re-shuffles on doc_id only. No corpus-sized
    * join, no second tokenize pass.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df")) // rows of tf = docs w/ term
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfT), "term")
      .join(broadcast(nDocs))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "score")
  }

  /** Per-document cross-entropy under the corpus unigram LM (the CCNet-ish
    * statistical quality signal: boilerplate-heavy or vocabulary-degenerate
    * documents score low, -log p mass concentrated on frequent terms):
    * xent(D) = mean over tokens t of -ln(count(t) / total_tokens).
    *
    * One corpus aggregation on the term (vocabulary-sized result), one
    * shuffle joining tokens to their counts, one per-document mean.
    */
  def withUnigramXent(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).cast("double").as("tc"))
    val total = counts.agg(sum("tc").as("total"))
    toks.join(broadcast(counts), "term")
      .join(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("tc") / col("total"))), 4).as("unigram_xent"))
  }

  /** Per-document cross-entropy under an INTERPOLATED BIGRAM corpus LM —
    * the next step up from [[withUnigramXent]] toward the KenLM-style
    * filters production pipelines run (CCNet's quality signal is a 5-gram
    * LM; a Jelinek-Mercer-interpolated bigram captures the dominant local
    * word-order term that a unigram is blind to — scrambled or
    * template-stitched text scores near its unigram xent, fluent text
    * scores lower):
    *   p(t_i | t_{i-1}) = λ·count(t_{i-1} t_i)/count(t_{i-1})
    *                      + (1-λ)·count(t_i)/total
    * with the first token of a document scored by the unigram term alone.
    * xent(D) = mean over tokens of -ln p.
    *
    * Plan shape: (prev, term) pairing is MAP-SIDE — each document's token
    * array pairs with its own shifted self inside one `transform`
    * expression, so no doc-keyed window shuffle exists anywhere (a lag
    * window would shuffle the whole token table once per consumer branch).
    * Then a vocabulary-bounded unigram aggregate (broadcast back, same as
    * the unigram face), a distinct-bigram-bounded count whose join back to
    * the token table shuffles on (prev, term) — the one exchange that
    * grows with corpus text, exactly the inverted-index discipline — and
    * one per-document mean. No corpus² anywhere.
    */
  def withBigramXent(docs: DataFrame, idCol: String, textCol: String,
                     lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda in (0,1): $lambda")
    val withPrev = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .select(col("doc_id"), explode(expr(
        // element_at is 1-based: the predecessor of 0-based position i is
        // element_at(ts, i); position 0 has none (null ⇒ unigram-only)
        "transform(ts, (t, i) -> struct(t as term, " +
          "if(i = 0, cast(null as string), element_at(ts, i)) as prev))"))
        .as("tp"))
      .select(col("doc_id"), col("tp.term").as("term"),
        col("tp.prev").as("prev"))
    val uni = withPrev.groupBy("term")
      .agg(count(lit(1)).cast("double").as("tc"))
    val total = uni.agg(sum("tc").as("total"))
    val bi = withPrev.where(col("prev").isNotNull)
      .groupBy("prev", "term").agg(count(lit(1)).cast("double").as("bc"))
    val p = when(col("prev").isNull, col("tc") / col("total"))
      .otherwise(lit(lambda) * coalesce(col("bc"), lit(0.0)) / col("ptc") +
        lit(1.0 - lambda) * col("tc") / col("total"))
    withPrev
      .join(broadcast(uni), "term")
      .join(broadcast(uni.select(col("term").as("prev"),
        col("tc").as("ptc"))), Seq("prev"), "left_outer")
      .join(bi, Seq("prev", "term"), "left_outer")
      .join(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(p)), 4).as("bigram_xent"))
  }

  /** CCNet-style perplexity bucketing: split each language's documents into
    * `buckets` quality tiers (head / middle / tail for 3) by their
    * [[withUnigramXent]] cross-entropy. CCNet trains on the head, audits
    * the tail; the bucket label is the mixing knob.
    *
    * Cutoffs are DISCRETE per-language quantiles — the smallest xent value
    * whose cumulative document count reaches ceil(n·k/buckets) — so the
    * label is a pure comparison and both engines agree bit-for-bit (the
    * xent is already rounded to 4 decimals).
    *
    * Scale shape: deliberately NOT `ntile` over a per-language window —
    * that sorts each whole language in one partition. Instead the corpus
    * aggregates to (lang, xent) distinct-value counts (bounded: xent has 4
    * decimals, so the value table is small regardless of corpus size), the
    * cumulative walk and cutoff pick run over that tiny table, and the
    * cutoffs broadcast back onto the documents for a map-side label.
    */
  def withXentBuckets(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    val xe = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(textCol).as("text"))
    // materialize the per-doc scores once: the cutoff branch (counts -> cum
    // -> cutoffs) and the label branch both consume `scored`, and without
    // the cut the whole xent chain (corpus tokenize + term-count shuffle +
    // rejoin) is evaluated once per consumer — three corpus scans in one
    // query. The checkpointed table is 4 compact columns per doc.
    val scored = withUnigramXent(xe, "doc_id", "text")
      .join(xe.select("doc_id", "lang"), "doc_id")
      .localCheckpoint(true)
    val counts = scored.groupBy("lang", "unigram_xent")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy("unigram_xent")
    val cum = counts
      .withColumn("cum", sum("c").over(w))
      .join(counts.groupBy("lang").agg(sum("c").as("n")), "lang")
    // cutoff k = smallest xent whose cumulative count reaches ceil(n*k/b)
    val cuts = (1 until buckets).map(k =>
      min(when(col("cum") >= ceil(col("n") * k / buckets),
        col("unigram_xent"))).as(s"c$k"))
    val cutoffs = cum.groupBy("lang").agg(cuts.head, cuts.tail: _*)
    val label = (1 until buckets).foldRight(lit(buckets): Column) { (k, rest) =>
      when(col("unigram_xent") <= col(s"c$k"), lit(k)).otherwise(rest)
    }
    scored.join(broadcast(cutoffs), "lang")
      .select(col("doc_id"), col("lang"), col("unigram_xent"),
        label.cast("int").as("bucket"))
  }
}
