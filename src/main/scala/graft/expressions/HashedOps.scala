package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the hashed-n-gram classifier
  * ([[graft.operators.HashedClassifier]]): the higher-order-function
  * formulation (transform/aggregate/sort_array chains) is
  * CodegenFallback — every element evaluates through the interpreted
  * expression walker, which benched ~1 ms/row at 64 buckets. These
  * kernels compute the IDENTICAL values (same md5-prefix bucket hash,
  * same sorted-occurrence fold order, same correctly-rounded products,
  * so the DuckDB oracle twins are untouched) as one static call per
  * row inside whole-stage codegen.
  */
object HashedOps {

  /** `hashed_buckets(text)` → the sorted gram-occurrence bucket array
    * (word uni+bigrams of the normalized text, md5-first-4-hex-digits
    * mod D) — [[graft.operators.HashedClassifier.buckets]]'s kernel
    * form. */
  def hashedBuckets(text: Column, d: Int): Column =
    graftx.column(HashedBucketsExpr(graftx.expr(text), d))

  /** `hashed_z(buckets)` → the z fold under plan-constant weights:
    * z = w(0), then += w(b+1)·X over the sorted occurrences — exactly
    * the fold order the oracle's list_prepend + list_reduce replays. */
  def hashedZ(buckets: Column, w: Array[Double], x: Double): Column =
    graftx.column(HashedZExpr(graftx.expr(buckets), w, x))

  def bucketsImpl(text: UTF8String, d: Int): ArrayData = {
    val norm = TextHashImpl.normalize(text).toString
    if (norm.isEmpty) return new GenericArrayData(Array.empty[Int])
    val words = new java.util.ArrayList[String]()
    var start = 0
    while (start <= norm.length) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) norm.length else sp
      if (end > start) words.add(norm.substring(start, end))
      start = end + 1
    }
    val nW = words.size()
    val out = new Array[Int](nW + math.max(nW - 1, 0))
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nW) {
      out(i) = bucketOf(md, words.get(i), d)
      i += 1
    }
    i = 0
    while (i < nW - 1) {
      out(nW + i) = bucketOf(md, words.get(i) + " " + words.get(i + 1), d)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** First 4 hex digits of md5 (= first 2 digest bytes) mod d — the
    * kernel twin of conv(substring(md5(g), 1, 4), 16, 10) % d. */
  private def bucketOf(md: java.security.MessageDigest, g: String, d: Int): Int = {
    md.reset()
    val h = md.digest(g.getBytes(StandardCharsets.UTF_8))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % d
  }

  def zImpl(bk: ArrayData, w: Array[Double], x: Double): Double = {
    var z = w(0)
    var i = 0
    val n = bk.numElements()
    while (i < n) {
      z = z + (w(bk.getInt(i) + 1) * x)
      i += 1
    }
    z
  }
}

case class HashedBucketsExpr(child: Expression, d: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashed_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HashedOps.bucketsImpl(input.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashedOps.bucketsImpl($c, $d)")

  override protected def withNewChildInternal(newChild: Expression): HashedBucketsExpr =
    copy(child = newChild)
}

case class HashedZExpr(child: Expression, w: Array[Double], x: Double)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_z"

  override protected def nullSafeEval(input: Any): Any =
    HashedOps.zImpl(input.asInstanceOf[ArrayData], w, x)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashedW", w, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashedOps.zImpl($c, $wRef, $x)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedZExpr =
    copy(child = newChild)
}
