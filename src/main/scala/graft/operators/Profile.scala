package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the data-quality pass every ingestion pipeline
  * runs before training: per-column row count, null count, exact
  * distinct count, and min/max, for any column subset, in ONE scan.
  *
  * Scale shape: all statistics for all requested columns compute in a
  * single partial+final aggregation over one pass of the table — the
  * multiple exact `count(distinct)`s plan as one Expand (each input row
  * fans out once per profiled column) rather than one scan per column;
  * min/max/null-counts ride the same aggregate. The result is one row
  * per PROFILED COLUMN (bounded by schema width, not data), unpivoted
  * engine-side via a literal struct array — no shuffle after the
  * aggregation's own.
  *
  * min/max are computed in the column's native type (numeric min, not
  * lexicographic) and rendered as strings so the profile has one schema
  * regardless of the columns profiled.
  */
object Profile {

  /** One row per column of `cols`: (col_name, n_rows, n_nulls,
    * n_distinct, min_v, max_v), ordered by col_name. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))
    }
    agged
      .select(col("n_rows"), explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_v"), col("p.max_v"))
      .orderBy(col("col_name"))
  }
}
