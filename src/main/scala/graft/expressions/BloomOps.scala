package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression — the
  * semi-join-reduction kernel (see [[graft.operators.BloomPrune]]).
  *
  * The filter rides the whole-stage-codegen'd plan as a reference
  * object (`addReferenceObj`, the [[NearestCentroid]] idiom): one
  * probe is a handful of hash-derived bit tests against a shared
  * read-only long[], no serde, no per-row allocation. `mightContain`
  * can return a false POSITIVE (row survives, the later real join
  * drops it) but never a false negative — so pruning with it preserves
  * inner-join results exactly, which is what the q40 oracle (the plain
  * un-pruned join in DuckDB) proves.
  *
  * Scale note: the filter's size is set by the BUILD side's key count
  * (~1.2 MB per million keys at 1% fpp), independent of the 100 TB
  * probe side — it ships once per executor with the task binary, the
  * same cost class as a broadcast dimension.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(a: Any): Any =
    bloom.mightContainLong(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, a => s"$ref.mightContainLong($a)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** [[BloomMightContain]] for STRING keys (doc fingerprints, URLs,
  * shingle hashes rendered as text). The filter was built over java
  * Strings (`stat.bloomFilter` adds Row values; `putString` hashes the
  * UTF-8 bytes), so the probe hands the UTF8String's bytes to
  * `mightContainBinary` — byte-identical hashing with no toString
  * allocation per row. */
case class BloomMightContainString(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_str"
  override protected def nullSafeEval(a: Any): Any =
    bloom.mightContainBinary(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, a => s"$ref.mightContainBinary($a.getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainString =
    copy(child = newChild)
}

object BloomOps {
  /** Column wrapper: TRUE when `key` (a BIGINT column) might be in
    * `bloom`; NULL key → NULL (a filter drops it, matching inner-join
    * semantics on NULL keys). */
  def bloomMightContain(key: Column, bloom: BloomFilter): Column =
    graftx.column(BloomMightContain(graftx.expr(key), bloom))

  /** [[bloomMightContain]] for STRING keys. */
  def bloomMightContainString(key: Column, bloom: BloomFilter): Column =
    graftx.column(BloomMightContainString(graftx.expr(key), bloom))
}
