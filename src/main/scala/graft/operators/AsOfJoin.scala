package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY §7.3's
  * "custom operator" category; DuckDB/kdb expose it as ASOF JOIN).
  *
  * For every left row, attach the right row with the greatest right.ts <=
  * left.ts within the same key. Implemented by composition (preference (a)
  * of the custom-operator ladder): tag + union + one window pass — a single
  * shuffle on (key), then a linear scan per key partition. No per-row probe
  * joins, no range-join blowup; scales as sort-merge on (key, ts).
  *
  * Equal timestamps match (right sorts before left at the same ts).
  */
object AsOfJoin {

  /** @param left       left rows
    * @param right      right rows
    * @param key        equi-key column name (present in both)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right columns to carry (renamed as given)
    * @param inner      drop left rows with no prior right row (ASOF inner)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[(String, String)],
               inner: Boolean = true): DataFrame =
    joinBy(left, right, key, leftTs, rightTs, rightCols, inner,
      forwardDir = false)

  /** Forward as-of: for every left row, the right row with the SMALLEST
    * right.ts >= left.ts within the key (equal timestamps match) — "the
    * next event after". Same single-shuffle union+window composition, with
    * the frame looking forward instead of back.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightCols: Seq[(String, String)],
              inner: Boolean = true): DataFrame =
    joinBy(left, right, key, leftTs, rightTs, rightCols, inner,
      forwardDir = true)

  private def joinBy(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightCols: Seq[(String, String)],
                     inner: Boolean, forwardDir: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val carried = struct(rightCols.map { case (c, as) => col(c).as(as) }: _*)
    val carrySchema = org.apache.spark.sql.types.StructType(
      rightCols.map { case (c, as) =>
        org.apache.spark.sql.types.StructField(as, right.schema(c).dataType)
      })
    // tag ordering puts the matchable right rows inside the frame at equal
    // timestamps: backward scans (..current] with rights BEFORE lefts;
    // forward scans [current..) with rights AFTER lefts
    val (lTag, rTag) = if (forwardDir) (0, 1) else (1, 0)
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_tag", lit(lTag))
      .withColumn("_carry", lit(null).cast(carrySchema))
    val r = right.withColumn("_ts", col(rightTs)).withColumn("_tag", lit(rTag))
      .withColumn("_carry", carried)
    val lAligned = l.select((lCols.map(col) :+ col("_ts") :+ col("_tag") :+ col("_carry")): _*)
    val rAligned = r.select((lCols.map(c =>
      if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
      :+ col("_ts") :+ col("_tag") :+ col("_carry")): _*)
    val ordered = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_tag"))
    val w = if (forwardDir)
      ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchExpr = if (forwardDir) first(col("_carry"), ignoreNulls = true)
      else last(col("_carry"), ignoreNulls = true)
    val joined = lAligned.unionByName(rAligned)
      .withColumn("_match", matchExpr.over(w))
      .where(col("_tag") === lTag)
    val base = if (inner) joined.where(col("_match").isNotNull) else joined
    base.select((lCols.map(col) ++
      rightCols.map { case (_, as) => col(s"_match.$as").as(as) }): _*)
  }
}
