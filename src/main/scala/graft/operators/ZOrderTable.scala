package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED Z-order-clustered table with incremental ingest — the
  * production loop around [[ZOrder]]'s cell math (q33 computes cells;
  * this stores them as the partition layout) and the two-column answer
  * to v07/v16's single-key served indexes:
  *
  *   - [[create]] trains the quantization ranges on the initial load,
  *     writes rows `partitionBy(zcell)`, and persists the ranges +
  *     layout fingerprint next to the data;
  *   - [[append]] encodes an increment under the STORED ranges (the
  *     v21 lesson: re-deriving ranges per increment would silently
  *     shift cell boundaries and split one logical cell across
  *     incompatible quantizations — the fingerprint fails fast on
  *     schema drift instead). Out-of-range increment values CLAMP into
  *     the edge cells, so later boxes still find them;
  *   - [[boxQuery]] enumerates the cells intersecting a rectangle
  *     (driver-side, ≤4^bits values), prunes the scan by
  *     `zcell IN (...)` — PartitionFilters, directories never listed —
  *     and re-applies the exact predicate to drop the edge-cell
  *     overshoot. Box results are therefore EXACTLY the plain filter
  *     over create ∪ appends (q47's oracle).
  *
  * At 100 TB: cells are partition directories, so an increment only
  * touches the directories its rows land in, a box reads only its
  * cells' files, and cell-level small-file debris compacts with
  * [[Compaction]] per directory — create/append/query/compact is the
  * whole clustered-table lifecycle.
  */
object ZOrderTable {

  final case class Ranges(aMin: Long, aMax: Long, bMin: Long, bMax: Long,
      bits: Int, schemaFp: String)

  private def rangesPath(dir: String) = Paths.get(dir, "_zorder_ranges.json")

  private def schemaFingerprint(df: DataFrame, aCol: String, bCol: String): String = {
    val dataCols = df.columns.filterNot(_ == "zcell")
    java.util.UUID.nameUUIDFromBytes(
      (dataCols.map(c => s"$c:${df.schema(c).dataType.sql}").mkString(",") +
        s"|a=$aCol|b=$bCol").getBytes(StandardCharsets.UTF_8)).toString
  }

  private def writeRanges(dir: String, r: Ranges): Unit = {
    val json =
      s"""{"aMin":${r.aMin},"aMax":${r.aMax},"bMin":${r.bMin},"bMax":${r.bMax},""" +
        s""""bits":${r.bits},"schemaFp":"${r.schemaFp}"}"""
    Files.write(rangesPath(dir), json.getBytes(StandardCharsets.UTF_8))
  }

  /** The stored quantization contract, or an error on an uninitialized
    * directory. */
  def readRanges(dir: String): Ranges = {
    require(Files.exists(rangesPath(dir)),
      s"zorder table: no _zorder_ranges.json under $dir — not a clustered table")
    val j = new String(Files.readAllBytes(rangesPath(dir)), StandardCharsets.UTF_8)
    def num(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).get.group(1).toLong
    val fp = s""""schemaFp":"([^"]+)"""".r.findFirstMatchIn(j).get.group(1)
    Ranges(num("aMin"), num("aMax"), num("bMin"), num("bMax"), num("bits").toInt, fp)
  }

  /** Quantize under FIXED stored bounds, clamped into [0, 2^bits): the
    * edge cells absorb out-of-range values so no row can land in a
    * cell no box ever enumerates. */
  private def clampedCell(x: Column, lo: Long, hi: Long, bits: Int): Column = {
    val cells = (1L << bits) - 1
    greatest(lit(0L), least(lit(cells),
      ZOrder.quantize(x, lit(lo), lit(hi), bits)))
  }

  private def withZCell(df: DataFrame, aCol: String, bCol: String, r: Ranges): DataFrame =
    df.withColumn("zcell", ZOrder.zValue(
      clampedCell(col(aCol), r.aMin, r.aMax, r.bits),
      clampedCell(col(bCol), r.bMin, r.bMax, r.bits), r.bits))

  /** Initial load: train ranges on `df`, cluster, persist the contract. */
  def create(df: DataFrame, aCol: String, bCol: String, bits: Int,
      dir: String): Ranges = {
    require(!Files.exists(Paths.get(dir)),
      s"zorder table: $dir already exists — append() to grow it")
    val mm = df.agg(
      min(col(aCol)), max(col(aCol)), min(col(bCol)), max(col(bCol))).head()
    require(!mm.isNullAt(0), "zorder table: initial load has no rows")
    def asL(i: Int) = mm.getAs[Number](i).longValue() // any integer-typed column
    val r = Ranges(asL(0), asL(1), asL(2), asL(3),
      bits, schemaFingerprint(df, aCol, bCol))
    withZCell(df, aCol, bCol, r)
      .write.partitionBy("zcell").parquet(dir)
    writeRanges(dir, r)
    r
  }

  /** Grow the table: encode under the stored ranges (fingerprint-
    * checked), append into the matching cell directories — only the
    * touched cells gain files. */
  def append(increment: DataFrame, aCol: String, bCol: String, dir: String): Unit = {
    val r = readRanges(dir)
    val fp = schemaFingerprint(increment, aCol, bCol)
    require(fp == r.schemaFp,
      s"zorder table: increment schema fingerprint $fp != stored ${r.schemaFp} " +
        "— appending a drifted schema would corrupt the layout")
    withZCell(increment, aCol, bCol, r)
      .write.mode("append").partitionBy("zcell").parquet(dir)
  }

  /** Rectangle query: `aLo <= a <= aHi AND bLo <= b <= bHi`, served by
    * cell pruning + exact re-filter — row-identical to the plain
    * filter over everything ever written. */
  def boxQuery(spark: SparkSession, dir: String, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val r = readRanges(dir)
    def q(x: Long, lo: Long, hi: Long): Long = {
      val cells = (1L << r.bits) - 1
      val raw = if (hi == lo) 0L else (x - lo) * cells / (hi - lo)
      math.max(0L, math.min(cells, raw))
    }
    val cells = ZOrder.cellsForBox(
      q(aLo, r.aMin, r.aMax), q(aHi, r.aMin, r.aMax),
      q(bLo, r.bMin, r.bMax), q(bHi, r.bMin, r.bMax), r.bits)
    spark.read.parquet(dir)
      .filter(col("zcell").isin(cells: _*))
      .filter(col(aCol).between(aLo, aHi) && col(bCol).between(bLo, bHi))
      .drop("zcell")
  }
}
