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
               inner: Boolean = true): DataFrame = {
    val lCols = left.columns.toSeq
    val carried = struct(rightCols.map { case (c, as) => col(c).as(as) }: _*)
    val carrySchema = org.apache.spark.sql.types.StructType(
      rightCols.map { case (c, as) =>
        org.apache.spark.sql.types.StructField(as, right.schema(c).dataType)
      })
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_tag", lit(1))
      .withColumn("_carry", lit(null).cast(carrySchema))
    val r = right.withColumn("_ts", col(rightTs)).withColumn("_tag", lit(0))
      .withColumn("_carry", carried)
    val lAligned = l.select((lCols.map(col) :+ col("_ts") :+ col("_tag") :+ col("_carry")): _*)
    val rAligned = r.select((lCols.map(c =>
      if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
      :+ col("_ts") :+ col("_tag") :+ col("_carry")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lAligned.unionByName(rAligned)
      .withColumn("_match", last(col("_carry"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val base = if (inner) joined.where(col("_match").isNotNull) else joined
    base.select((lCols.map(col) ++
      rightCols.map { case (_, as) => col(s"_match.$as").as(as) }): _*)
  }
}
