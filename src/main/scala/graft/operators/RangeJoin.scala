package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, scaled out as an equi join on a time
  * grid — the second specialized join (after [[AsOfJoin]]) that plain
  * Spark only offers as a nested-loop join. "Which campaign windows /
  * maintenance windows / sessions was this event inside?" is a range
  * predicate (`lo <= ts < hi`), and Spark plans a raw
  * `points.join(intervals, pred)` as BroadcastNestedLoopJoin — every
  * point compared against every interval, O(|points|·|intervals|), and
  * a driver OOM once the interval side outgrows the broadcast cap.
  *
  * Spark-first formulation (the classic grid/binning trick, same idea
  * as DuckDB's IEJoin prefilter and Databricks' range-join bin hints):
  *   1. explode each interval onto the fixed-width grid cells it
  *      covers (`sequence(cell(lo), cell(hi - 1µs))` — hi exclusive);
  *   2. map each point to the single cell containing it;
  *   3. equi-join on the cell and re-check the exact residual
  *      predicate.
  * Each (point, interval) match shares exactly ONE cell — the point's
  * own — so the join emits no duplicates and needs no post-dedup. The
  * equi key turns the nested loop into a hash join: broadcast while
  * the exploded interval side is small, shuffle-on-cell (with AQE skew
  * splitting for hot cells) once both sides are large — the 100 TB
  * shape a nested loop can never reach.
  *
  * Cell width tunes replication: intervals replicate by
  * ceil(length / cellWidth), points never replicate. Pick it near the
  * median interval length — e.g. day-length cells for day-scale
  * campaign windows (j02 uses 1 day).
  */
object RangeJoin {

  /** Join `points` to every `intervals` row whose `[lo, hi)` contains
    * the point's timestamp.
    *
    * @param points      big side; one timestamp column
    * @param ptTs        the point's event-time column (timestamp)
    * @param intervals   interval side; `[lo, hi)` half-open, may
    *                    overlap or nest freely
    * @param lo          interval start column (timestamp, inclusive)
    * @param hi          interval end column (timestamp, exclusive)
    * @param cellMicros  grid cell width in microseconds (> 0)
    * @return all matching (point, interval) row pairs, with the grid
    *         plumbing column dropped; intervals' columns must not
    *         collide with the points' by name
    */
  def pointInInterval(points: DataFrame, ptTs: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      cellMicros: Long): DataFrame = {
    require(cellMicros > 0, s"cellMicros must be positive: $cellMicros")
    // SQL `div` — exact integral division. Float `/` would lose the
    // low bits of epoch micros (~1.7e18 > 2^53; the same hazard
    // Tables.events documents). `div` truncates toward zero rather
    // than flooring, but the mapping only has to be IDENTICAL and
    // monotonic on both sides: any point in [lo, hi) then lands in a
    // cell inside its interval's cell range, so no match is missed and
    // (one cell per point) none is duplicated — for any epoch sign.
    val cells = intervals
      .withColumn("__lo_us", unix_micros(lo))
      .withColumn("__hi_us", unix_micros(hi))
      // hi is exclusive, so its last covered cell holds hi - 1µs
      .withColumn("__cell", explode(expr(
        s"sequence(__lo_us div $cellMicros, (__hi_us - 1) div $cellMicros)")))
      .drop("__lo_us", "__hi_us")
    points
      .withColumn("__pt_us", unix_micros(ptTs))
      .withColumn("__cell", expr(s"__pt_us div $cellMicros"))
      .drop("__pt_us")
      .join(cells, "__cell")
      .where(ptTs >= lo && ptTs < hi)
      .drop("__cell")
  }

  /** Interval × interval OVERLAP join: every (left, right) pair whose
    * half-open windows intersect — `llo < rhi AND rlo < lhi`. The
    * grid trick generalizes from [[pointInInterval]]: both sides
    * explode onto cells, the equi-join runs on the cell, and the exact
    * overlap predicate re-checks.
    *
    * Dedup-free by construction: an overlapping pair shares MANY cells,
    * so the join alone would duplicate it per shared cell — instead the
    * match is credited to exactly ONE cell, the first both sides cover:
    * `cell(max(llo, rlo)) = max(cell(llo), cell(rlo))` (the cell map is
    * monotone). Both intervals contain `max(llo, rlo)` whenever they
    * overlap (it is the overlap's start, strictly below both his at µs
    * resolution), so that cell always joins, and the equality filter
    * keeps it alone — no `dropDuplicates` shuffle chasing the output.
    *
    * Same contract as pointInInterval otherwise: half-open [lo, hi),
    * `div`-truncated µs cells (identical monotone mapping both sides),
    * column names must not collide across the two inputs, and cell
    * width tunes interval replication — pick it near the SHORTER
    * side's typical length. */
  def intervalOverlap(left: DataFrame, llo: Column, lhi: Column,
      right: DataFrame, rlo: Column, rhi: Column,
      cellMicros: Long): DataFrame = {
    require(cellMicros > 0, s"cellMicros must be positive: $cellMicros")
    // EMPTY intervals (lo >= hi) are dropped before the grid: they can
    // overlap nothing, but Spark's sequence() counts DOWN for them
    // (cell(hi-1) < cell(lo)), so an empty [x, x) would still land on
    // its start cell — and the llo<rhi AND rlo<lhi predicate ACCEPTS an
    // empty interval strictly inside the other side (x < b and a < x),
    // emitting a match whose intersection is empty. The filter is the
    // half-open contract made explicit, and it pushes to the scan.
    def onGrid(df: DataFrame, lo: Column, hi: Column, startCell: String) =
      df.where(lo < hi)
        .withColumn("__lo_us", unix_micros(lo))
        .withColumn("__hi_us", unix_micros(hi))
        .withColumn(startCell, expr(s"__lo_us div $cellMicros"))
        .withColumn("__cell", explode(expr(
          s"sequence(__lo_us div $cellMicros, (__hi_us - 1) div $cellMicros)")))
        .drop("__lo_us", "__hi_us")
    onGrid(left, llo, lhi, "__lstart")
      .join(onGrid(right, rlo, rhi, "__rstart"), "__cell")
      .where(llo < rhi && rlo < lhi)
      .where(col("__cell") === greatest(col("__lstart"), col("__rstart")))
      .drop("__cell", "__lstart", "__rstart")
  }
}
