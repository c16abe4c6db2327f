package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) join: left rows matched to right rows with the same
  * key and right timestamp within a trailing window of the left timestamp —
  * `rts ∈ [lts - window, lts]`.
  *
  * A naive inequality join plans as a broadcast-nested-loop (O(|L|·|R|) —
  * unusable at 100 TB). This operator makes it an equi-join: both sides are
  * bucketed by `floor(ts / window)`; a left row's trailing window can only
  * overlap its own bucket and the previous one, so the left side explodes
  * into exactly 2 probe buckets and joins on (key, bucket), with the exact
  * range predicate applied as a post-filter. Work is proportional to true
  * bucket co-occurrence, shuffles hash-partition on (key, bucket), and skew
  * is bounded by bucket population (AQE skew-join splits hot buckets).
  *
  * The composition-over-built-ins design mirrors [[AsOfJoin]]: callers
  * pre-rename right-side columns to avoid collisions.
  */
object RangeJoin {

  /** Inner join of `left` to all `right` rows with equal key and
    * `rightTs ∈ [leftTs - windowMicros, leftTs]` (inclusive both ends).
    */
  def backwardWindow(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__lb", floor(col("__lus") / windowMicros))
      .withColumn("__probe", explode(array(col("__lb") - 1, col("__lb"))))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__rb", floor(col("__rus") / windowMicros))
    l.join(r,
        col("__probe") === col("__rb") && col(leftKey) === col(rightKey) &&
          col("__rus") >= col("__lus") - windowMicros &&
          col("__rus") <= col("__lus"))
      .drop("__lus", "__lb", "__probe", "__rus", "__rb")
  }
}
