package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._

/** Deterministic byte-level feature extraction for multimodal binary
  * columns: the Spark-side plumbing (schema, codegen, null handling) is
  * real; the kernel is the STUB standing in for an actual image/audio
  * decoder+encoder (decode libraries are not in this container — see
  * [[graft.operators.Multimodal]]). A real deployment swaps
  * [[BinaryFeaturesImpl.byteFeatures]] for a model-backed embedder with
  * the same `binary → array<double>` contract.
  */
object BinaryFeatures {
  /** `binary_features(payload, dim)` → array<double> of `dim` bucket
    * statistics over the payload bytes; NULL for empty payloads. */
  def apply(payload: Column, dim: Int): Column =
    graftx.column(BinaryFeaturesExpr(graftx.expr(payload), dim))
}

object BinaryFeaturesImpl {
  /** Signed random-projection sketch of the payload's byte 4-grams:
    * each 4-byte window hashes to a bucket and a ±1 sign; the vector is
    * L2-normalized and rounded to 6 dp. Payloads sharing most 4-grams
    * (near-duplicate media) land close in cosine space; unrelated
    * payloads are near-orthogonal — so the output plugs into the LSH /
    * kNN stack without the degenerate all-vectors-collinear behavior a
    * naive byte-average would produce. One pass, allocation-free except
    * the output. */
  def byteFeatures(bytes: Array[Byte], dim: Int): ArrayData = {
    if (bytes == null || bytes.length == 0) return null
    val f = new Array[Double](dim)
    val n = bytes.length
    if (n < 4) {
      // degenerate short payload: hash it whole
      var w = 0L
      var i = 0
      while (i < n) { w = (w << 8) | (bytes(i) & 0xffL); i += 1 }
      val h = TextHashImpl.mix64(w)
      f(math.floorMod((h >>> 1).toInt, dim)) = if ((h & 1L) == 0L) 1.0 else -1.0
      return new GenericArrayData(f)
    }
    var i = 0
    while (i + 4 <= n) {
      val w = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      val h = TextHashImpl.mix64(w)
      val j = math.floorMod((h >>> 1).toInt, dim)
      f(j) += (if ((h & 1L) == 0L) 1.0 else -1.0)
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += f(j) * f(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    j = 0
    while (j < dim) {
      f(j) = math.round(f(j) * inv * 1e6) / 1e6
      j += 1
    }
    new GenericArrayData(f)
  }
}

case class BinaryFeaturesExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim > 0, s"dim must be positive, got $dim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "binary_features"

  override protected def nullSafeEval(input: Any): Any =
    BinaryFeaturesImpl.byteFeatures(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.BinaryFeaturesImpl.byteFeatures($c, $dim);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): BinaryFeaturesExpr =
    copy(child = newChild)
}
