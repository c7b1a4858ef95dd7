package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector SUM as a partial+final custom aggregate — the
  * shape that makes distributed centroid/statistics updates cheap:
  * aggregating `array<double>` columns directly means the shuffle
  * carries ONE (group, d-vector) buffer per map partition instead of
  * the d-fold row fan-out a `posexplode → sum` pipeline pushes through
  * the partial aggregate (64× the rows for 64-d embeddings, exploded
  * over the whole corpus BEFORE combining).
  *
  * Semantics: NULL inputs are skipped (like built-in sum); an
  * all-NULL/empty group evaluates to NULL; ragged lengths are an error
  * (the [[VectorOpsImpl]] contract — a silent zip would return wrong
  * math). Addition is sequential per buffer and buffers merge
  * pairwise, so summation order depends on partitioning exactly like
  * built-in `sum`/`avg` — consumers round (the floor(x·1e4+0.5)
  * contract) before comparing across runs or engines.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      if (buf == null) a.toDoubleArray()
      else {
        if (a.numElements() != buf.length)
          throw new IllegalArgumentException(
            s"vec_sum: vector length ${a.numElements()} != accumulated length ${buf.length}")
        var i = 0
        while (i < buf.length) { buf(i) += a.getDouble(i); i += 1 }
        buf
      }
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1 == null) b2
    else if (b2 == null) b1
    else {
      if (b1.length != b2.length)
        throw new IllegalArgumentException(
          s"vec_sum: merging buffers of length ${b1.length} and ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      bb.asDoubleBuffer().put(buf)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Element-wise MIN and MAX in one pass, one buffer — the scalar-
  * quantization trainer's statistics ([[graft.operators.Sq]]): the
  * buffer is [min_0..min_{d-1}, max_0..max_{d-1}] (length 2d), updates
  * and merges are element-wise min/max, so the full per-dimension range
  * costs one partial+final aggregate and ships ONE 2d-vector per map
  * partition — never a d-fold posexplode. Same NULL/ragged contract as
  * [[VectorSum]]. */
case class VectorMinMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "vec_min_max"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      val d = a.numElements()
      if (buf == null) {
        val b = new Array[Double](2 * d)
        var i = 0
        while (i < d) { val x = a.getDouble(i); b(i) = x; b(d + i) = x; i += 1 }
        b
      } else {
        if (2 * d != buf.length)
          throw new IllegalArgumentException(
            s"vec_min_max: vector length $d != accumulated length ${buf.length / 2}")
        var i = 0
        while (i < d) {
          val x = a.getDouble(i)
          if (x < buf(i)) buf(i) = x
          if (x > buf(d + i)) buf(d + i) = x
          i += 1
        }
        buf
      }
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1 == null) b2
    else if (b2 == null) b1
    else {
      if (b1.length != b2.length)
        throw new IllegalArgumentException(
          s"vec_min_max: merging buffers of length ${b1.length} and ${b2.length}")
      val d = b1.length / 2
      var i = 0
      while (i < d) {
        if (b2(i) < b1(i)) b1(i) = b2(i)
        if (b2(d + i) > b1(d + i)) b1(d + i) = b2(d + i)
        i += 1
      }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      bb.asDoubleBuffer().put(buf)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMinMax =
    copy(child = newChild)
}

object VectorAgg {
  /** Column wrapper: element-wise sum of an `array<double>` column. */
  def vecSum(a: Column): Column =
    graftx.column(VectorSum(graftx.expr(a)).toAggregateExpression())

  /** Column wrapper: one-pass element-wise [mins ++ maxes] (length 2d). */
  def vecMinMax(a: Column): Column =
    graftx.column(VectorMinMax(graftx.expr(a)).toAggregateExpression())
}
