package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch point query as a native codegen'd expression: the
  * estimated frequency of a STRING key, with the sketch riding the
  * plan as a reference object ([[BloomMightContain]]'s idiom — no
  * serde, no per-row deserialization; `estimateCount` is a read-only
  * depth-many array probe, thread-safe across tasks).
  *
  * The estimate is one-sided: `est >= true count` always, and
  * `est <= true + eps*N` with probability 1-delta (eps/delta fixed at
  * sketch build). t33 turns that guarantee into a hashable oracle flag.
  *
  * The sketch was BUILT over java.lang.String items
  * (`stat.countMinSketch` adds Row values), so the probe converts
  * UTF8String accordingly — probing with raw UTF8String bytes would
  * hash into different counters and silently return garbage.
  */
case class CmsEstimate(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def nullSafeEval(a: Any): Any =
    cms.estimateCount(a.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, a => s"$ref.estimateCount($a.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object SketchOps {
  /** Estimated frequency of string column `key` under `cms`; NULL key
    * → NULL. */
  def cmsEstimate(key: Column, cms: CountMinSketch): Column =
    graftx.column(CmsEstimate(graftx.expr(key), cms))
}
