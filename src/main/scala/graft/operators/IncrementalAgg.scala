package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view-delta
  * pattern: a per-key aggregate SNAPSHOT is stored once, and each
  * arriving increment batch is aggregated ALONE and merged into the
  * snapshot, so the full fact table is never re-scanned. At 100 TB
  * this is the difference between a daily job that reads yesterday's
  * (tiny) state + today's (small) increment and one that re-reads the
  * whole history.
  *
  * The state discipline is the same one partial+final hash aggregation
  * uses inside a single query, lifted to a table you can persist:
  * store MERGEABLE statistics (count, sum, min, max), never finalized
  * ones — an average cannot be merged from averages, so `finalize`
  * derives it at read time from (sum, count). Merging is associative
  * and commutative, so increments can arrive in any order and batch
  * boundaries cannot change the result — EXACT up to floating-point
  * summation order for the double `sum`: IEEE addition is not
  * associative, so an adversarial value mix can differ from the full
  * recompute in low-order bits (count/min/max are exact regardless).
  * The query layer's round(+1e-9) render absorbs that headroom; the
  * spec asserts bit-exact split-recompute equality on deliberately
  * binary-exact fixture values, where summation order cannot matter.
  */
object IncrementalAgg {

  /** The mergeable per-key state of `valueCol`:
    * (keys..., cnt, sum, vmin, vmax). NULL values are skipped (like
    * built-in sum/avg); a key whose values are all NULL keeps
    * cnt = 0 and NULL sum/min/max. */
  def aggState(df: DataFrame, keyCols: Seq[Column], valueCol: Column): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(
        count(valueCol).as("cnt"),
        sum(valueCol).as("sum"),
        min(valueCol).as("vmin"),
        max(valueCol).as("vmax"))

  /** Merge two state tables (either side may be missing keys — a new
    * key in the increment, a quiet key in the snapshot). Output is
    * again a state table: merge(merge(a, b), c) == merge(a, merge(b,
    * c)) and both == aggState over the unioned rows. Keys join
    * NULL-SAFELY (`<=>`): groupBy treats NULL as one group, so the
    * merge must too — a plain equi-join would emit a NULL-key row from
    * EACH side instead of combining them, breaking the
    * split-recompute law (spec-asserted). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val an = a.select(
      keys.map(k => col(k).as(s"ka_$k")) :+
        struct(col("cnt"), col("sum"), col("vmin"), col("vmax")).as("sa"): _*)
    val bn = b.select(
      keys.map(k => col(k).as(s"kb_$k")) :+
        struct(col("cnt"), col("sum"), col("vmin"), col("vmax")).as("sb"): _*)
    val cond = keys.map(k => col(s"ka_$k") <=> col(s"kb_$k")).reduce(_ && _)
    an.join(bn, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"ka_$k"), col(s"kb_$k")).as(k)) ++ Seq(
          (coalesce(col("sa.cnt"), lit(0L)) + coalesce(col("sb.cnt"), lit(0L))).as("cnt"),
          // sum of an all-NULL/absent side is NULL; NULL + x must give x
          when(col("sa.sum").isNull, col("sb.sum"))
            .when(col("sb.sum").isNull, col("sa.sum"))
            .otherwise(col("sa.sum") + col("sb.sum")).as("sum"),
          least(col("sa.vmin"), col("sb.vmin")).as("vmin"),
          greatest(col("sa.vmax"), col("sb.vmax")).as("vmax")): _*)
  }

  /** Finalized view of a state table: derived statistics that are NOT
    * mergeable (avg) materialize only here, at read time. */
  def finalize(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("cnt"),
        col("sum"),
        (col("sum") / nullif(col("cnt"), lit(0L))).as("avg"),
        col("vmin"),
        col("vmax")): _*)
}
