package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-layout
  * technique (Delta/Iceberg `OPTIMIZE ZORDER BY`) that makes parquet
  * min/max stats prune on SEVERAL columns at once: interleave the bits of
  * d key columns into one z-value and lay rows out in z order, and any
  * file/row-group then covers a compact hyper-rectangle of the key space —
  * a range predicate on ANY subset of the keys skips most files, where a
  * single-column sort prunes only its leading column.
  *
  * The z-value is plain column arithmetic (shift/mask/sum — codegen'd,
  * engine-replayable bit math; no UDF, no randomness): bit i of column j
  * lands at position i·d + j. Inputs are masked to the low `bits` bits, so
  * the mapping is total; d·bits must fit a signed long. Values are
  * expected non-negative (ids, dense ranks, bucketed measures — the usual
  * clustering keys); negative inputs two's-complement-mask like any bit
  * interleave would.
  *
  * Scale shape: `cluster` is ONE `repartitionByRange` on the z-value
  * (range exchange with sampled bounds) + an intra-partition sort — the
  * same cost as sorting by any single column, but the resulting layout
  * serves every key column's predicates. The pruning win is measured in
  * OperatorsSpec: per-file (min, max) boxes from a z-clustered layout
  * intersect a 2-D range predicate in ~√F of F files vs ~all files for a
  * 1-D layout on the non-leading column.
  */
object ZOrder {

  /** Morton z-value of `cols` using the low `bits` bits of each. */
  def zvalue(cols: Seq[Column], bits: Int = 16): Column = {
    val d = cols.size
    require(d >= 1, "need at least one column")
    require(bits >= 1 && d * bits <= 63, s"d*bits must fit a long: $d*$bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * d + j))
    terms.reduce(_ + _)
  }

  /** The DuckDB/SQL replay of [[zvalue]] for oracle parity. */
  def zvalueSql(cols: Seq[String], bits: Int = 16): String = {
    val d = cols.size
    (for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(($c >> $i) & 1) * ${1L << (i * d + j)}").mkString(" + ")
  }

  /** Lay `df` out in z order across `numFiles` range partitions, each
    * internally z-sorted — the write-side clustering step before a
    * `partitionBy`-free parquet dump. Adds the `zval` column.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16,
              numFiles: Int = 16): DataFrame =
    df.withColumn("zval", zvalue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
}
