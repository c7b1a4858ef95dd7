package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels — see [[graft.operators.Sq]] for
  * the operator. One byte per dimension against PQ's one code per
  * SUBSPACE: SQ8 is the simpler 8×-compression point (float64 → uint8)
  * that needs no codebook training, only per-dimension ranges, and
  * decodes with two flops — the standard first rung of an ANN
  * compression ladder. Both kernels ride whole-stage codegen with the
  * range arrays as plan constants (`addReferenceObj`, the
  * [[NearestCentroid]] pattern).
  *
  * Bit-portability contract (the DuckDB oracle recomputes both
  * kernels): code = clamp(floor((x - min)/scale + 0.5), 0, 255) with
  * scale = (max - min)/255 (a zero-range dimension stores code 0),
  * dequant = min + code·scale, and the ADC accumulates
  * (q_i − dequant_i)² in DIMENSION ORDER — left-associated IEEE adds,
  * the same `floor(x+0.5)` rounding pair the gng_prototypes oracle
  * pins. */
object SqOps {
  /** `array<smallint>`-free: codes pack into BINARY (one byte per
    * dimension, unsigned 0–255). */
  def sqEncode(v: Column, mins: Array[Double], scales: Array[Double]): Column =
    graftx.column(SqEncode(graftx.expr(v), mins, scales))

  /** Asymmetric distance: squared L2 between the RAW query and the
    * dequantized code row, ranges as plan constants. */
  def sqAdc(codes: Column, query: Array[Double], mins: Array[Double],
      scales: Array[Double]): Column =
    graftx.column(SqAdc(graftx.expr(codes), query, mins, scales))
}

object SqOpsImpl {
  def encode(a: ArrayData, mins: Array[Double], scales: Array[Double]): Array[Byte] = {
    val d = mins.length
    if (a.numElements() != d)
      throw new IllegalArgumentException(
        s"sq_encode: vector length ${a.numElements()} != trained dim $d")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val c =
        if (scales(i) == 0.0) 0.0
        else math.floor((a.getDouble(i) - mins(i)) / scales(i) + 0.5)
      val clamped = if (c < 0.0) 0.0 else if (c > 255.0) 255.0 else c
      out(i) = clamped.toInt.toByte
      i += 1
    }
    out
  }

  def adc(codes: Array[Byte], q: Array[Double], mins: Array[Double],
      scales: Array[Double]): Double = {
    val d = q.length
    if (codes.length != d)
      throw new IllegalArgumentException(
        s"sq_adc: code length ${codes.length} != query dim $d")
    var acc = 0.0
    var i = 0
    while (i < d) {
      val deq = mins(i) + (codes(i) & 0xff) * scales(i)
      val diff = q(i) - deq
      acc += diff * diff
      i += 1
    }
    acc
  }
}

case class SqEncode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression {
  require(mins.length == scales.length,
    s"sq_encode: mins (${mins.length}) and scales (${scales.length}) must align")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_encode"
  override protected def nullSafeEval(a: Any): Any =
    SqOpsImpl.encode(a.asInstanceOf[ArrayData], mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("mins", mins, "double[]")
    val sRef = ctx.addReferenceObj("scales", scales, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.SqOpsImpl.encode($a, $mRef, $sRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

case class SqAdc(child: Expression, query: Array[Double], mins: Array[Double],
    scales: Array[Double]) extends UnaryExpression {
  require(query.length == mins.length && mins.length == scales.length,
    s"sq_adc: query (${query.length}), mins (${mins.length}), scales " +
      s"(${scales.length}) must align")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc"
  override protected def nullSafeEval(a: Any): Any =
    SqOpsImpl.adc(a.asInstanceOf[Array[Byte]], query, mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", query, "double[]")
    val mRef = ctx.addReferenceObj("mins", mins, "double[]")
    val sRef = ctx.addReferenceObj("scales", scales, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.SqOpsImpl.adc($a, $qRef, $mRef, $sRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): SqAdc =
    copy(child = newChild)
}
