package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Raw-HTML main-text extraction as one fused codegen kernel — the
  * pipeline stage BEFORE everything else in the engine: every t-family
  * operator assumes clean `documents.text`, but a real crawl delivers
  * markup (the CommonCrawl WET-production / trafilatura stage). One
  * kernel pass per row, no UDF serde, no shuffle.
  *
  * The extraction contract, stage by stage (each stage is mirrored
  * verbatim by the t59 DuckDB oracle, so the pipeline is pinned
  * cross-engine, not just "looks reasonable"):
  *
  *   1. drop `<script…>…</script>` and `<style…>…</style>` blocks
  *      (case-insensitive, dot-matches-newline, non-greedy);
  *   2. drop HTML comments `<!-- … -->`;
  *   3. unwrap CDATA sections (keep the payload);
  *   4. closing BLOCK tags (`</p> </div> </li> … </footer>`) and
  *      `<br>` become newlines — they are the line structure;
  *   5. every remaining tag is stripped (`<[^>]*>`; an unclosed `<`
  *      with no `>` stays literal text — broken markup degrades
  *      deterministically, it never throws);
  *   6. entities decode in ONE left-to-right pass over the source
  *      (numeric `&#65;`/`&#x42;` + the named set
  *      lt/gt/quot/apos/nbsp/copy/amp in a single alternation), so
  *      NO nested escape ever double-decodes: `&amp;lt;` and
  *      `&#38;lt;` both yield the literal `&lt;` — real HTML
  *      semantics (round-12 fix; the old numeric-then-named replace
  *      chain got `&#38;lt;` wrong). The t59 oracle's replace-chain
  *      twin is equivalent on the fixture because neither the page
  *      shell nor the synthetic doc text contains nested escapes
  *      (checked: zero `&` in documents.text at every SF);
  *   7. per line: whitespace runs collapse to one space, trim;
  *   8. text-density filter: keep lines with ≥ 5 whitespace-separated
  *      tokens (navigation chrome, titles, copyright lines fall
  *      under it; prose survives) — the line-based density rule of
  *      boilerplate removers, with token count as the density proxy.
  *
  * The reference has no text surface (SURVEY §7.2.5 extension); kernel
  * discipline follows TextHash/TextNorm: `doGenCode` emits one static
  * call, stays inside whole-stage codegen.
  */
object HtmlExtract {

  /** `html_extract(html)` → the extracted main text (kept lines joined
    * by `\n`, possibly empty); NULL in, NULL out. */
  def htmlExtract(html: Column): Column =
    graftx.column(HtmlExtractExpr(graftx.expr(html)))
}

object HtmlExtractImpl {

  private val Script = Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val Style = Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Cdata = Pattern.compile("(?s)<!\\[CDATA\\[(.*?)\\]\\]>")
  private val Block = Pattern.compile(
    "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|nav|footer|header|section|article|blockquote|pre)>|<br */?>")
  private val Tag = Pattern.compile("<[^>]*>")
  private val Entity = Pattern.compile(
    "&(#([0-9]{1,7})|#[xX]([0-9a-fA-F]{1,6})|lt|gt|quot|apos|nbsp|copy|amp);")
  private val Ws = Pattern.compile("[ \\t\\r\\f]+")

  /** TRUE single-pass entity decode (round-11 advisor: the old
    * numeric-then-named replace chain double-decoded nested escapes —
    * '&#38;lt;' became '<' where real HTML semantics yield the literal
    * '&lt;'): ONE left-to-right scan over the original text, every
    * reference decoded from source characters only, so a decoded '&'
    * can never recombine with following text into a second entity. */
  private def decodeEntities(s: String): String = {
    val m = Entity.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    do {
      sb.append(s, last, m.start())
      if (m.group(2) != null || m.group(3) != null) {
        val (digits, radix) =
          if (m.group(2) != null) (m.group(2), 10) else (m.group(3), 16)
        val cp = try Integer.parseInt(digits, radix) catch { case _: NumberFormatException => -1 }
        if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) sb.appendCodePoint(cp)
        else sb.append(m.group(0)) // out-of-range reference stays literal
      } else sb.append(m.group(1) match {
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "nbsp" => " "
        case "copy" => "©"
        case _ => "&" // amp
      })
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  def extract(html: UTF8String): UTF8String = {
    var t = html.toString
    t = Script.matcher(t).replaceAll("")
    t = Style.matcher(t).replaceAll("")
    t = Comment.matcher(t).replaceAll("")
    t = Cdata.matcher(t).replaceAll("$1")
    t = Block.matcher(t).replaceAll("\n")
    t = Tag.matcher(t).replaceAll("")
    t = decodeEntities(t)
    val sb = new java.lang.StringBuilder
    for (line <- t.split("\n", -1)) {
      val collapsed = Ws.matcher(line).replaceAll(" ").trim
      // ≥5 tokens ⇔ ≥4 spaces (runs are collapsed, edges trimmed)
      if (collapsed.length > 0) {
        var spaces = 0
        var i = 0
        while (i < collapsed.length) {
          if (collapsed.charAt(i) == ' ') spaces += 1
          i += 1
        }
        if (spaces >= 4) {
          if (sb.length > 0) sb.append('\n')
          sb.append(collapsed)
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

case class HtmlExtractExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "html_extract"

  override protected def nullSafeEval(input: Any): Any =
    HtmlExtractImpl.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HtmlExtractImpl.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)
}
