package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonical first step of every crawl-text pipeline (decomposed
  * accents, mixed producers, editor artifacts all collapse to one
  * canonical byte form, so every later operator — hashing, dedup,
  * tokenization — sees equal text as equal bytes).
  *
  * Named `nfc_normalize` after the DuckDB built-in it twins: both
  * implement Unicode canonical composition, so the t48 oracle is
  * engine-native on the DuckDB side and this expression on the Spark
  * side, with no ported bit math in between. Only NFC is offered —
  * the COMPATIBILITY forms (NFKC/NFKD) are lossy (ﬁ→fi, ①→1) and a
  * cleaning pipeline that wants them should opt in explicitly, not
  * inherit them from a "normalize" default.
  *
  * The reference has no text surface (SURVEY §7.2.5 extension); this
  * follows the TextHash discipline: one fused kernel, `doGenCode`
  * emitting a static call, no UDF serde boundary.
  */
object TextNorm {

  /** `nfc_normalize(text)` → the Unicode NFC form of `text`; NULL in,
    * NULL out. ASCII and already-normalized strings return the input
    * buffer untouched. */
  def nfcNormalize(text: Column): Column =
    graftx.column(NfcNormalizeExpr(graftx.expr(text)))
}

object TextNormImpl {

  /** Unicode canonical composition. Fast paths, in order: pure-ASCII
    * input (bytes == codepoints ⇔ no multi-byte sequence; NFC is the
    * identity on 7-bit text — the overwhelming hot path on real
    * corpora) returns the input with NO String materialization; input
    * that is already in NFC (`Normalizer.isNormalized`, a scan without
    * allocation) returns the input buffer. Only genuinely decomposed
    * text pays the normalize-and-reencode. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextNormImpl.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextNormImpl.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
