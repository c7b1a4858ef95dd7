package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the lakehouse layout technique
  * for multi-dimensional pruning: interleaving the bits of two
  * quantized sort keys places rows that are close in BOTH dimensions
  * into the same file/partition, so a range predicate on EITHER (or
  * both) columns prunes most of a 100 TB table at listing time.
  * A single-column sort gives perfect pruning on one key and none on
  * the other; the Z-curve trades a little of each for pruning on both.
  *
  * Everything here is integer shift/mask arithmetic over built-ins —
  * inside whole-stage codegen in Spark, and expressed with the same
  * `>>`/`&` operators in the DuckDB oracle twin, so cell assignment is
  * bit-identical across engines (no floats anywhere).
  *
  * Serving pattern: write the table `partitionBy(zcell)`; a query box
  * [aLo..aHi] × [bLo..bHi] prunes with `zcell IN cellsForBox(...)` —
  * the candidate cells enumerate driver-side (≤ 4^bits, a few dozen
  * for the usual 2–4 bits per dimension at partition granularity),
  * and the raw-column predicate still pushes into the scan for exact
  * filtering within the surviving cells.
  */
object ZOrder {

  /** Quantize `x` in [minV, maxV] to a cell index in [0, 2^bits):
    * ((x − minV) · (2^bits − 1)) div (maxV − minV) — exact for
    * |products| < 2^52 (the floor of an exactly-represented double
    * quotient equals integer division for non-negative operands; both
    * engines use the same formula). */
  def quantize(x: Column, minV: Column, maxV: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits out of range: $bits")
    val cells = (1L << bits) - 1
    when(maxV === minV, lit(0L))
      .otherwise(floor((x.cast("long") - minV) * cells / (maxV - minV)).cast("long"))
  }

  /** DuckDB twin of [[quantize]]. */
  def quantizeSql(x: String, minV: String, maxV: String, bits: Int): String = {
    val cells = (1L << bits) - 1
    s"CASE WHEN $maxV = $minV THEN 0 ELSE (($x - $minV) * $cells) // ($maxV - $minV) END"
  }

  /** Bit-interleave two quantized cell indices (each in [0, 2^bits)):
    * z = Σᵢ bitᵢ(a)·2^(2i+1) + bitᵢ(b)·2^(2i), via shift/mask. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** The DuckDB twin of [[zValue]] — generated from the same loop with
    * the same shift/mask operators, so the arithmetic cannot drift. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i + 1)} + (($b >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** Reference (driver-side) interleave for specs and box enumeration. */
  def zValueLocal(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      ((a >> i) & 1L) << (2 * i + 1) | ((b >> i) & 1L) << (2 * i)
    }.sum

  /** All z-cells intersecting the quantized query box
    * [aLo..aHi] × [bLo..bHi] — the pruning predicate's IN-list.
    * Driver-side enumeration over the box's cells: partition-granular
    * `bits` is 2–4 in practice (16–256 cells total), so this is
    * microseconds; a big-`bits` serving path would walk the curve
    * (BIGMIN) instead. */
  def cellsForBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long, bits: Int): Seq[Long] = {
    require(bits > 0 && bits <= 8, s"cellsForBox enumerates the 4^bits grid; bits=$bits")
    val cells = for {
      a <- aLo to aHi
      b <- bLo to bHi
    } yield zValueLocal(a, b, bits)
    cells.distinct.sorted
  }
}
