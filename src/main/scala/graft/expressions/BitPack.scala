package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{DataType, FloatType, LongType}

/** Sign-bit packing for binary-quantized ANN
  * ([[graft.operators.BinaryQuant]]): component i of a float vector
  * becomes bit i of ONE long — set iff the 1e-4-quantized component
  * exceeds its per-dimension trained threshold. Quantizing BOTH sides
  * of the comparison to exact integers (floor(v·10⁴ + 0.5), thresholds
  * likewise) removes every cross-engine float-boundary hazard: the
  * packed word is a pure integer function of the input. One static
  * call per row inside whole-stage codegen; thresholds ride as a plan
  * reference object. */
object BitPack {

  def signPack(vec: Column, thrQ: Array[Long]): Column =
    graftx.column(SignPackExpr(graftx.expr(vec), thrQ))

  /** Same quantization for a driver-side vector (the query). */
  def packVector(v: Array[Double], thrQ: Array[Long]): Long = {
    var word = 0L
    var i = 0
    while (i < thrQ.length && i < v.length && i < 64) {
      if (math.floor(v(i) * 10000.0 + 0.5).toLong > thrQ(i)) word |= (1L << i)
      i += 1
    }
    word
  }

  def packImpl(ar: ArrayData, thrQ: Array[Long]): Long = {
    val n = math.min(math.min(ar.numElements(), thrQ.length), 64)
    var word = 0L
    var i = 0
    while (i < n) {
      val vq = math.floor(ar.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      if (vq > thrQ(i)) word |= (1L << i)
      i += 1
    }
    word
  }
}

case class SignPackExpr(child: Expression, thrQ: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_pack expects array<float>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    BitPack.packImpl(input.asInstanceOf[ArrayData], thrQ)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signPackThr", thrQ, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.BitPack.packImpl($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)
}
