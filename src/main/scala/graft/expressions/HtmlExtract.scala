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
  *   6. entities decode in a FIXED order: numeric (`&#65;`/`&#x42;`)
  *      first, then the named set lt/gt/quot/apos/nbsp/copy, `&amp;`
  *      LAST (so `&amp;lt;` yields the literal `&lt;`, matching a
  *      single-pass decoder);
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
  private val NumDec = Pattern.compile("&#([0-9]{1,7});")
  private val NumHex = Pattern.compile("&#[xX]([0-9a-fA-F]{1,6});")
  private val Ws = Pattern.compile("[ \\t\\r\\f]+")

  private def decodeNumeric(s: String, p: Pattern, radix: Int): String = {
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    do {
      sb.append(s, last, m.start())
      val cp = try Integer.parseInt(m.group(1), radix) catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) sb.appendCodePoint(cp)
      else sb.append(m.group(0)) // out-of-range reference stays literal
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
    t = decodeNumeric(t, NumDec, 10)
    t = decodeNumeric(t, NumHex, 16)
    t = t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&nbsp;", " ").replace("&copy;", "©")
      .replace("&amp;", "&")
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
