package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector algebra over `ArrayType(DoubleType)`.
  *
  * Re-expresses the reference's Breeze vector helpers (see
  * /root/reference src/main/scala/org/lipn/clustering/batchStream/
  * batchStreamModel.scala:384-431 — `scal`, `addPairwise`, `axpy`,
  * `squaredDistance` usage at :115,342) as Catalyst higher-order-function
  * expressions, so they stay inside the optimized plan (no UDF/serde
  * boundary) and compose with pushdown/pruning.
  *
  * All functions assume equal-length arrays; embeddings stored as
  * `array<float>` should be cast first via [[asDouble]].
  */
object VectorFunctions {

  /** Cast array<float> (or any numeric array) to array<double>. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Elementwise a+b  (reference `addPairwise`, batchStreamModel.scala:395-403). */
  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Elementwise a-b. */
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)

  /** Scalar * vector  (reference `scal`, batchStreamModel.scala:384-392). */
  def vecScale(s: Column, a: Column): Column = transform(a, x => s * x)

  /** s*x + y  (reference `axpy`, batchStreamModel.scala:406-416). */
  def vecAxpy(s: Column, x: Column, y: Column): Column =
    zip_with(x, y, (xi, yi) => s * xi + yi)

  /** Dot product Σ aᵢ·bᵢ — native codegen'd kernel
    * ([[graft.expressions.VectorOps]]); expects array<double>. */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorOps.dot(a, b)

  /** Squared Euclidean distance Σ (aᵢ−bᵢ)²
    * (reference breeze.squaredDistance, used batchStreamModel.scala:115,342);
    * native codegen'd kernel. */
  def squaredDistance(a: Column, b: Column): Column =
    graft.expressions.VectorOps.squaredDistance(a, b)

  /** Euclidean distance (reference batchStreamModel.scala:129-139). */
  def euclideanDistance(a: Column, b: Column): Column = sqrt(squaredDistance(a, b))

  /** L2 norm — native codegen'd kernel. */
  def norm2(a: Column): Column = graft.expressions.VectorOps.norm2(a)

  /** Cosine similarity a·b / (‖a‖‖b‖) — one fused pass over both arrays. */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.expressions.VectorOps.cosineSimilarity(a, b)

  /** SOM neighborhood kernel exp(-‖a−b‖²/T)
    * (reference `kNeighborSOM`, batchStreamModel.scala:341-343). */
  def kNeighborSom(a: Column, b: Column, temperature: Column): Column =
    exp(negate(squaredDistance(a, b)) / temperature)

  /** Elementwise |aᵢ−bᵢ| ≤ ε quasi-equality
    * (reference `areQuasiEqual`, batchStreamModel.scala:420-431). */
  def quasiEqual(a: Column, b: Column, eps: Double): Column =
    forall(zip_with(a, b, (x, y) => abs(x - y) <= lit(eps)), identity)
}
