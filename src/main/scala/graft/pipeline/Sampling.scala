package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.charFold

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is irreproducible across runs and engines —
  * useless for auditable dataset construction. Both operators here derive
  * the sampling decision from a polynomial hash of the row id, so the same
  * rows are selected on every run, on any engine (the DuckDB oracle replays
  * the identical fold).
  *
  * Scale: `hashPercent` is a map-side filter (no shuffle, pushes nothing —
  * but prunes before any downstream shuffle). `stratifiedTopK` shuffles once
  * on the stratum key; per-stratum state is a k-row heap (row_number over a
  * window), never the full stratum.
  */
object Sampling {

  /** Hash of the id column used as the (deterministic) randomness source. */
  private def idHash(idCol: Column): Column = charFold(idCol.cast("string"))

  /** Deterministic Bernoulli-ish sample: keeps rows whose id-hash lands in
    * the lowest `percent` of the hash space mod 100.
    */
  def hashPercent(df: DataFrame, idCol: Column, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.where(idHash(idCol) % 100 < percent)
  }

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows per
    * stratum, selected in id-hash order (pseudorandom but reproducible),
    * ties broken by id.
    */
  def stratifiedTopK(df: DataFrame, strataCol: Column, idCol: Column,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idHash(idCol), idCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis 2006): each row draws u ∈ (0, 1] from its id hash and ranks
    * by key = -ln(u) / w ascending; the k smallest keys win. The scheme's
    * guarantee: selection probabilities match sequential weighted draws
    * without replacement exactly, while the computation is one map-side
    * key column + a single top-k (TakeOrdered — never a global sort), so
    * it distributes trivially where the sequential definition doesn't.
    * The standard corpus-curation shape: "sample 1M documents favoring
    * quality/length weights, reproducibly, on any engine."
    *
    * u = (idHash + 1) / (P + 1) with P the fold modulus — engine-exact
    * arithmetic; the only cross-engine freedom is ln()'s final ulp, which
    * changes selection only on ~1e-15-relative key ties (adjacent draws
    * are ~1/n apart; at any realistic n the flip probability is
    * negligible, and per-engine the result is exactly reproducible).
    * Weights must be > 0.
    */
  def weightedTopK(df: DataFrame, idCol: Column, weightCol: Column,
                   k: Int): DataFrame = {
    // (P + 1) derived from the fold modulus so u stays in (0, 1] if
    // HashMod ever changes — single source of truth
    val key = -log((idHash(idCol) + 1).cast("double") /
      lit((graft.functions.TextFunctions.HashMod + 1).toDouble)) / weightCol
    df.withColumn("__wk", key)
      .orderBy(col("__wk"), idCol)
      .limit(k)
      .drop("__wk")
  }

  /** Deterministic train/val/test split assignment — the canonical "hash
    * the id, bucket mod 100" dataset split (reproducible on any engine, and
    * stable under corpus growth: a document's split never changes when new
    * documents arrive, which `df.randomSplit` cannot guarantee). `splits`
    * is an ORDERED (name, percent) list summing to 100; buckets are
    * assigned to names in list order over the cumulative boundaries.
    * Map-side column math, zero shuffle.
    */
  def splitAssign(df: DataFrame, idCol: Column,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 100, s"split percents must be >0 and sum to 100: $splits")
    val bucket = idHash(idCol) % 100
    val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assign = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic mixture sampling — the data-mixing step of a training
    * pipeline: draw the LARGEST corpus that hits the target group
    * proportions exactly, bounded by per-group availability.
    *
    * With target weight p_g per group (normalized) and n_g rows available,
    * the achievable total is T = floor(min over g of n_g / p_g) and each
    * group contributes take_g = floor(T * p_g) rows, selected in id-hash
    * order (reproducible; ties by id). All derivation happens in-plan: the
    * per-group counts aggregate is group-cardinality-sized and broadcast
    * back; selection is one row_number window per group. Groups absent
    * from `weights` are dropped.
    */
  def mixture(df: DataFrame, groupCol: Column, idCol: Column,
              weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val total = weights.values.sum
    val wTable = weights.toSeq.sortBy(_._1)
      .map { case (g, p) => (g, p / total) }
      .foldLeft(Option.empty[DataFrame]) { case (acc, (g, p)) =>
        val row = df.sparkSession.range(1).select(
          lit(g).as("__grp"), lit(p).as("__p"))
        Some(acc.fold(row)(_.unionByName(row)))
      }.get
    // LEFT join from the weight table: a weighted group with ZERO available
    // rows must drive capacity to 0 (the proportions are unreachable), not
    // silently vanish from the min and skew the mixture mono-group
    val counts = wTable.join(
        df.select(groupCol.as("__grp"))
          .groupBy("__grp").agg(count(lit(1)).cast("double").as("__n")),
        Seq("__grp"), "left_outer")
      .withColumn("__n", coalesce(col("__n"), lit(0.0)))
    val capacity = counts.agg(
      floor(min(col("__n") / col("__p"))).cast("double").as("__cap"))
    val takes = counts.join(broadcast(capacity))
      .select(col("__grp"), floor(col("__cap") * col("__p")).as("__take"))
    val w = Window.partitionBy(col("__grp")).orderBy(idHash(idCol), idCol)
    df.withColumn("__grp", groupCol)
      .join(broadcast(takes), "__grp")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__take"))
      .drop("__grp", "__take", "__rn")
  }

  /** Token-budget mixture — the production data-mixing contract. Training
    * mixes are specified in TOKENS per source ("1T tokens: 67% web, 15%
    * code, …"), not documents: document counts under-weight long documents
    * and a doc-proportional draw ([[mixture]]) lands arbitrarily far from
    * the token targets when per-group length distributions differ. Given an
    * additive size column (token count, char count — any per-row cost) and
    * a per-group budget in those units, admit documents per group in
    * id-hash order (reproducible, engine-independent) while the group's
    * running total stays within budget: a document is taken iff the
    * cumulative size INCLUDING it is ≤ the budget. Prefix semantics — the
    * scan stops at the first overflow rather than best-fit repacking later
    * smaller docs — keep selection a pure window cumsum, exactly replayable
    * in SQL (best-fit would be NP-ish and engine-divergent). Groups without
    * a budget are dropped.
    *
    * Scale: one shuffle on the group key; the cumsum window streams each
    * group partition once. Group count is the parallelism unit — for a
    * handful of very large groups, pre-partition by (group, hash range) and
    * run per-range prefix sums (the [[Packing]] two-level pattern).
    *
    * Returns the selected rows plus `cum_size` (running total including the
    * row, in budget units).
    */
  def tokenBudgetMixture(df: DataFrame, groupCol: Column, idCol: Column,
                         sizeCol: Column, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0))
    val spark = df.sparkSession
    import spark.implicits._
    val bTable = broadcast(budgets.toSeq.sortBy(_._1)
      .toDF("__grp", "__budget"))
    val w = Window.partitionBy(col("__grp")).orderBy(idHash(idCol), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__grp", groupCol)
      .join(bTable, "__grp")
      .withColumn("cum_size", sum(sizeCol.cast("long")).over(w))
      .where(col("cum_size") <= col("__budget"))
      .drop("__grp", "__budget")
  }

  /** Temperature-scaled mixture targets — the standard multilingual
    * data-mixing computation (q_g ∝ n_g^(1/τ), Conneau & Lample 2019):
    * given a token/doc budget B, each group's target is
    * floor(B · n_g^p / Σ_h n_h^p) with p = 1/τ. `power` is restricted to
    * small INTEGER p and computed by repeated multiplication, so the
    * arithmetic is exact in doubles on any engine (pow() implementations
    * may differ in the last ulp; n·n never does). p=2 ⇔ τ=0.5 sharpens
    * toward big groups; τ>1 flattening needs fractional p and a tolerance
    * gate, so it is deliberately out of scope here.
    *
    * Scale: one group-cardinality aggregate, one scalar total broadcast
    * back over it — no per-row work at all beyond the count.
    */
  def temperatureTargets(df: DataFrame, groupCol: Column, power: Int,
                         budget: Long): DataFrame = {
    require(power >= 1 && power <= 4, "integer power 1..4 (p = 1/τ)")
    val cnts = df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).cast("double").as("n"))
    val weighted = cnts.withColumn("w",
      (1 until power).foldLeft(col("n"))((acc, _) => acc * col("n")))
    val tot = weighted.agg(sum(col("w")).as("s"))
    weighted.crossJoin(broadcast(tot))
      .select(col("grp"), col("n").cast("long").as("n_docs"),
        floor(lit(budget.toDouble) * col("w") / col("s"))
          .cast("long").as("target_docs"))
      .orderBy("grp")
  }

  /** Deterministic global training order: each row gets a shard and a
    * position within its shard, both derived from the id hash — the
    * published-data-order practice (SlimPajama / OLMo ship exactly this)
    * that makes a training run's sample order reproducible and resumable
    * on any engine, where `df.orderBy(rand())` is neither. The position
    * uses a SECOND fold round (id + a salt suffix) so shard assignment and
    * intra-shard order are decorrelated — rows that land in the same shard
    * are not also clustered by the ordering key.
    *
    * Scale: one shuffle on the shard id; the intra-shard rank window runs
    * over a 1/nShards slice of the corpus — pick nShards so a shard fits
    * an executor (production corpora use thousands).
    */
  def globalShuffle(df: DataFrame, idCol: Column, nShards: Int): DataFrame = {
    require(nShards > 0)
    val posKey = charFold(concat(idCol.cast("string"), lit("#shuf")))
    val shard = (idHash(idCol) % nShards).cast("int")
    val w = Window.partitionBy(col("__shard")).orderBy(posKey, idCol)
    df.withColumn("__shard", shard)
      .withColumn("pos", row_number().over(w).cast("int"))
      .withColumnRenamed("__shard", "shard")
  }
}
