package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated inner equi-join.
  *
  * A plain shuffle join sends every left row with the same key to one
  * reducer; at 100 TB a single hot key (a boilerplate document, a hub node)
  * stalls the stage. Salting splits each hot key across `saltBuckets`
  * reducers: the left side appends a deterministic salt derived from a
  * non-key column, the (small) right side replicates once per salt value,
  * and the join runs on (key, salt). Result rows are identical to the
  * unsalted join — the salt only changes the partitioning.
  *
  * Complements AQE's skew-join (which splits oversized partitions after the
  * shuffle): salting prevents the skewed shuffle from being written at all,
  * at the cost of a `saltBuckets`× replication of the right side — use for
  * fact-times-dimension joins where the right side is small but too big (or
  * too load-bearing) to broadcast.
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `leftKey = rightKey`,
    * distributing each left key over `saltBuckets` partitions. `saltOn` is
    * any left-side expression with per-row spread (a line number, an id) —
    * it only seeds the salt, never affects the result.
    */
  def innerSalted(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  saltBuckets: Int, saltOn: Column): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val l = left.withColumn("__salt", pmod(hash(saltOn), lit(saltBuckets)))
    val r = right.withColumn("__rsalt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    l.join(r, col(leftKey) === col(rightKey) && col("__salt") === col("__rsalt"))
      .drop("__salt", "__rsalt")
  }
}
