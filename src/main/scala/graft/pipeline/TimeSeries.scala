package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed time-series operators over the events stream — the
  * signal-smoothing face of an analytics engine (activity scoring, drift
  * monitors, per-entity health metrics).
  */
object TimeSeries {

  /** `col()` PARSES attribute names (dots nest, a lone backtick is a
    * syntax error) — every caller-supplied column name is referenced
    * through the escaped-identifier form, the same discipline as
    * [[graft.operators.Profile]], so any legal DataFrame column name
    * (dots, hyphens, spaces) resolves as ONE column.
    */
  private def c(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Ordered conversion funnel — the classic product-analytics sequence
    * query: for each entity, how far through `steps` (e.g. view → click →
    * purchase) its event history advances, where step i counts only at or
    * after the earliest completion of step i-1. Returns (key, stage) with
    * stage in 0..steps.length (0 = never did step 1).
    *
    * Plan shape: one filtered per-step aggregation chain — each step is a
    * type-filtered groupBy(key).min(ts) joined to the previous step's
    * completion times — so the whole funnel is `steps` entity-keyed
    * shuffles over ever-shrinking stage tables, never a window over the
    * full event history. Completion is monotone by construction (step i
    * requires step i-1), so the final stage is a sum of left-join flags.
    */
  def funnelStages(events: DataFrame, keyCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val reached = steps.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val evs = events.where(col(typeCol) === step)
          .select(col(keyCol).as("k"), col(tsCol).as("ts"))
        val stage =
          if (i == 0) evs.groupBy("k").agg(min("ts").as("t"))
          else evs.join(acc.last.select(col("k"), col("t").as("__tp")), "k")
            .where(col("ts") >= col("__tp"))
            .groupBy("k").agg(min("ts").as("t"))
        acc :+ stage
    }
    val users = events.select(col(keyCol).as("k")).distinct()
    val flagged = reached.zipWithIndex.foldLeft(users) { case (df, (st, i)) =>
      df.join(st.select(col("k"), lit(1).as(s"__s$i")), Seq("k"), "left_outer")
    }
    val stageCol = reached.indices
      .map(i => coalesce(col(s"__s$i"), lit(0))).reduce(_ + _)
    flagged.select(col("k").as(keyCol), stageCol.cast("int").as("stage"))
  }

  /** Cohort retention matrix — the other classic product-analytics query:
    * bucket entities into cohorts by their FIRST-activity week, then count
    * how many of each cohort are active again k weeks later. Returns
    * (cohort_week, week_offset, n_active) with week = floor(epoch/7d) —
    * integer arithmetic end to end, so both engines agree bit-for-bit.
    *
    * Plan shape: one entity-keyed aggregation for the cohort assignment
    * (broadcast back onto the per-(entity, week) activity table, itself
    * one distinct shuffle), one matrix aggregation — all keyed exchanges,
    * no window over event history.
    */
  def cohortRetention(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    // floor, not divide-then-cast: long `/` lifts to double division and the
    // cast truncates toward zero, which disagrees with the oracle's
    // floor(epoch/604800) for pre-1970 timestamps
    val wk = floor(unix_timestamp(col(tsCol)) / 604800L).cast("long")
    val active = events.select(col(keyCol).as("k"), wk.as("week")).distinct()
    val cohorts = active.groupBy("k").agg(min("week").as("cohort_week"))
    active.join(cohorts, "k")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Per-key exponentially-weighted moving average of `valueCol` in
    * (`orderCols`) order: y_1 = x_1, y_i = α·x_i + (1-α)·y_{i-1}; returns
    * (key, n_events, ewma = the final smoothed value, rounded before
    * output so the left-to-right IEEE fold replays engine-identically).
    *
    * Plan shape: ONE shuffle keyed on the entity, then a per-key sorted
    * fold over the collected series — the recurrence is inherently
    * sequential per key, so the parallelism unit is the key, which is
    * exactly how a 1000-executor cluster wants it (keys are many, series
    * are bounded). For unbounded per-key history, feed this
    * windowed/sessionized slices instead of all time — the operator is
    * deliberately per-slice.
    */
  def ewmaByKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
                valueCol: String, alpha: Double = 0.3): DataFrame = {
    val ordered = struct((orderCols.map(col) :+ col(valueCol).as("__v")): _*)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(ordered)).as("__evs"))
      .select(col(keyCol), col("n_events"),
        round(aggregate(
          slice(transform(col("__evs"), e => e("__v")), lit(2),
            size(col("__evs"))),
          element_at(col("__evs"), 1)("__v"),
          (acc: Column, x: Column) => lit(alpha) * x + lit(1.0 - alpha) * acc),
          4).as("ewma"))
  }

  /** Robust per-entity anomaly detection — the modified z-score on the
    * median/MAD (Iglewicz & Hoaglin 1993): z = 0.6745 · (x − median) /
    * MAD, flagging |z| > k (3.5 is the standard cut). Median-based, so a
    * burst of outliers cannot drag its own baseline the way a mean/stddev
    * z-score does — the drift/abuse monitor face of the events family.
    * Returns the flagged rows (key, id, value, med, mad, z) with z
    * rounded to 4; keys whose MAD is 0 (constant series) flag nothing —
    * deviation from a degenerate baseline is unscorable, not infinite.
    *
    * Plan shape: two key-keyed EXACT-percentile aggregations (the second
    * over |x − med|, joined back by key) and a map-side score — percentile
    * state is O(values per key), the same per-key-bounded contract as
    * [[ewmaByKey]]; feed windowed slices for unbounded histories.
    */
  def anomalies(df: DataFrame, keyCol: String, idCol: String,
                valueCol: String, k: Double = 3.5): DataFrame = {
    // Column API end to end (no name splicing into SQL text) and every
    // intermediate under a __graft_ prefix, so caller columns named
    // med/mad/z/__k neither break parsing nor get silently shadowed.
    val v = c(valueCol)
    val med = df.groupBy(c(keyCol).as("__graft_k"))
      .agg(percentile(v, lit(0.5)).as("__graft_med"))
    val withMed = df.join(med, c(keyCol) === col("__graft_k"))
      .drop("__graft_k")
    val mad = withMed.groupBy(c(keyCol).as("__graft_k"))
      .agg(percentile(abs(v - col("__graft_med")), lit(0.5))
        .as("__graft_mad"))
    withMed.join(mad, c(keyCol) === col("__graft_k")).drop("__graft_k")
      .where(col("__graft_mad") > 0)
      .withColumn("__graft_z", round(
        lit(0.6745) * (v - col("__graft_med")) / col("__graft_mad"), 4))
      .where(abs(col("__graft_z")) > k)
      .select(c(keyCol), c(idCol), v,
        round(col("__graft_med"), 4).as("med"),
        round(col("__graft_mad"), 4).as("mad"),
        col("__graft_z").as("z"))
  }

  /** Resample each entity's series onto a FIXED bucket grid with
    * last-observation-carried-forward gap fill — the regularization step
    * every downstream window/forecast/drift model assumes (irregular
    * event times → one row per (key, bucket) from the key's first to last
    * active bucket, empty buckets carrying the previous bucket's value and
    * flagged `gap_filled`). Returns (key, bucket_start epoch-seconds,
    * n_events, v, gap_filled), v = round(avg(valueCol), 4) per bucket
    * before the fill so both engines fill from identical doubles.
    *
    * Plan shape: one (key, bucket)-keyed partial-agg shuffle; the dense
    * grid is a per-key `sequence` explode bounded by the key's own active
    * span (never a global calendar cross join); the LOCF fill is a window
    * partitioned BY KEY ordered by bucket — per-entity state, the same
    * parallelism unit as the rest of the family, no single-partition
    * global window anywhere.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(unix_timestamp(c(tsCol)) / bucketSeconds)
    val agg = df.groupBy(c(keyCol).as("__graft_k"), bucket.as("__graft_b"))
      .agg(count(lit(1)).as("__graft_n"),
        round(avg(c(valueCol)), 4).as("__graft_v"))
    val dense = agg.groupBy("__graft_k")
      .agg(min("__graft_b").as("b0"), max("__graft_b").as("b1"))
      .select(col("__graft_k"),
        explode(sequence(col("b0"), col("b1"))).as("__graft_b"))
    val w = Window.partitionBy("__graft_k").orderBy("__graft_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(agg, Seq("__graft_k", "__graft_b"), "left_outer")
      .select(col("__graft_k").as(keyCol),
        (col("__graft_b") * bucketSeconds).cast("long").as("bucket_start"),
        coalesce(col("__graft_n"), lit(0L)).as("n_events"),
        last(col("__graft_v"), ignoreNulls = true).over(w).as("v"),
        col("__graft_v").isNull.as("gap_filled"))
  }

  /** Classic additive seasonal decomposition over the [[resample]]d grid:
    * v = trend + seasonal + resid, with trend the centered moving average
    * of width `period` (odd), seasonal the per-(key, phase) mean of the
    * detrended series re-centered to sum to zero per key, and resid the
    * remainder — the drift-vs-seasonality separator a metrics monitor
    * needs before alerting on raw deltas (a weekly shape is not an
    * anomaly). Emits only rows with a FULL trend window (the classic
    * edge-trim).
    *
    * Every mean is rounded to 4 decimals in EXACT 1e-4 fixed-point
    * integer arithmetic (half-away-from-zero), not float: a float mean
    * whose true value sits near a .00005 tie rounds differently across
    * engines (Java BigDecimal vs C++ `round(x·10⁴)/10⁴` disagree by one
    * ulp of the scaled product), which showed up as last-digit seasonal
    * flips in cross-engine runs. Integer sums and integer rounding are
    * bit-identical everywhere.
    *
    * Plan shape: the resample's keyed shuffles, then ONE per-key window
    * (state bounded by `period`) and two phase-keyed aggregations whose
    * results broadcast back — parallelism stays per-entity, no global
    * window, no extra full-history shuffle beyond the grid itself.
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, bucketSeconds: Long,
                        period: Int = 7): DataFrame = {
    require(period > 1 && period % 2 == 1,
      "period must be odd (centered moving average)")
    import org.apache.spark.sql.expressions.Window
    // round(p/q) to the nearest integer, half away from zero, in pure
    // integer/exact arithmetic (q > 0; magnitudes far below 2^53 so the
    // one double division is correctly rounded and engine-identical)
    def rnd(p: Column, q: Column): Column =
      signum(p).cast("long") *
        floor((lit(2L) * abs(p) + q) / (lit(2L) * q)).cast("long")
    val h = (period - 1) / 2
    val rs = resample(df, keyCol, tsCol, valueCol, bucketSeconds)
    val wT = Window.partitionBy(c(keyCol)).orderBy("bucket_start")
      .rowsBetween(-h, h)
    val det = rs
      .withColumn("__graft_sv", round(col("v") * 10000).cast("long"))
      .withColumn("__graft_cnt", count(lit(1)).over(wT))
      .withColumn("__graft_ts",
        rnd(sum("__graft_sv").over(wT), col("__graft_cnt")))
      .where(col("__graft_cnt") === period)
      .withColumn("__graft_ds", col("__graft_sv") - col("__graft_ts"))
      .withColumn("__graft_ph",
        pmod(expr(s"bucket_start DIV $bucketSeconds"), lit(period.toLong)))
    val phase = det.groupBy(c(keyCol).as("__graft_k"), col("__graft_ph"))
      .agg(rnd(sum("__graft_ds"), count(lit(1))).as("__graft_sraw"))
    val center = phase.groupBy("__graft_k")
      .agg(rnd(sum("__graft_sraw"), count(lit(1))).as("__graft_s0"))
    det
      .join(broadcast(phase.join(center, "__graft_k")),
        c(keyCol) === col("__graft_k") &&
          det("__graft_ph") === phase("__graft_ph"))
      .withColumn("__graft_ss", col("__graft_sraw") - col("__graft_s0"))
      .select(c(keyCol), col("bucket_start"), col("v"),
        (col("__graft_ts") / 10000.0).as("trend"),
        (col("__graft_ss") / 10000.0).as("seasonal"),
        ((col("__graft_ds") - col("__graft_ss")) / 10000.0).as("resid"))
  }
}
