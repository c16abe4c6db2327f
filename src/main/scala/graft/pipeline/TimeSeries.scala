package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed time-series operators over the events stream — the
  * signal-smoothing face of an analytics engine (activity scoring, drift
  * monitors, per-entity health metrics).
  */
object TimeSeries {

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
}
