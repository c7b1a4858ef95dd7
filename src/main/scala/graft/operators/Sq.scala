package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{SqOps, VectorAgg}

/** Scalar quantization (SQ8) for ANN serving — the first rung of the
  * compression ladder below [[Pq]]: one unsigned byte per DIMENSION
  * (float64 → 8× smaller, float32 → 4×), no codebook training, exact
  * per-dimension error bound scale/2 = (max−min)/510.
  *
  * Why it earns a place next to PQ at 100 TB: SQ needs only a
  * per-dimension [min, max] — ONE partial+final aggregate over the
  * corpus ([[graft.expressions.VectorMinMax]]: a single 2d-double
  * buffer per map partition, no posexplode, no sample, no k-means —
  * and re-training under drift is that same cheap pass), its codes
  * decode with two flops so the ADC stays codegen-trivial, and 8×
  * smaller codes mean 8× more corpus per executor page — the common
  * production choice when recall matters more than PQ's deeper
  * compression. The serving plan is [[Pq]]'s: codes-only scan, ADC as
  * a plan-constant kernel, TakeOrdered top-k, zero shuffle.
  */
object Sq {

  /** Trained ranges. `scales(i) = (max_i - min_i)/255`; a constant
    * dimension trains scale 0 and always decodes to its min. */
  final case class Ranges(mins: Array[Double], scales: Array[Double])

  /** ONE aggregate pass → per-dimension ranges (driver gets a single
    * 2d-double row — bounded, like the PQ codebook). */
  def train(df: DataFrame, embCol: Column): Ranges = {
    val row = df.filter(embCol.isNotNull)
      .agg(VectorAgg.vecMinMax(embCol).as("mm"))
      .head()
    require(!row.isNullAt(0), "sq train: no non-null vectors")
    val mm = row.getSeq[Double](0).toArray
    val d = mm.length / 2
    val mins = mm.slice(0, d)
    val scales = Array.tabulate(d)(i => (mm(d + i) - mm(i)) / 255.0)
    Ranges(mins, scales)
  }

  /** (id, codes) — the 1-byte-per-dimension compressed index. */
  def encodeIndex(df: DataFrame, embCol: Column, idCol: Column,
      r: Ranges): DataFrame =
    df.filter(embCol.isNotNull)
      .select(idCol.as("id"),
        SqOps.sqEncode(embCol, r.mins, r.scales).as("codes"))

  /** Top-k by asymmetric (query-vs-dequantized) squared L2 over a
    * codes index: a narrow codegen'd scan + TakeOrdered, no shuffle —
    * v10's serving shape at SQ8's compression point. Distances round
    * 4dp with lowest-id tie-break (the engine-wide ranking contract). */
  def sqKnn(index: DataFrame, query: Array[Double], r: Ranges,
      k: Int): DataFrame =
    index
      .select(col("id"),
        round(SqOps.sqAdc(col("codes"), query, r.mins, r.scales) + 1e-9, 4)
          .as("qdist"))
      .orderBy(col("qdist"), col("id"))
      .limit(k)
}
