package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** The html_extract contract on hand-computed fixtures, leaning on the
  * adversarial end: nested/broken/unclosed markup, CDATA, entity
  * ordering, and the density filter's boundary. The t59 oracle pins
  * the same staged pipeline cross-engine on the corpus; this spec pins
  * the cases a synthetic corpus page can't reach. */
class HtmlExtractSpec extends AnyFunSuite with SparkTestSupport {

  private def extractOne(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(HtmlExtract.htmlExtract(col("t")).as("x"))
      .collect().head.getString(0)
  }

  test("script/style/comment blocks vanish wholesale, including their text") {
    assert(extractOne(
      "<p>one two three four five</p><script>var kept = 'no six seven eight nine ten';</script>") ===
      "one two three four five")
    assert(extractOne(
      "<style>p { content: 'a b c d e f' }</style><p>alpha beta gamma delta epsilon</p>") ===
      "alpha beta gamma delta epsilon")
    assert(extractOne(
      "<p>uno dos tres cuatro cinco</p><!-- comment with plenty of words inside it -->") ===
      "uno dos tres cuatro cinco")
  }

  test("case-insensitive, attribute-bearing, multi-line script still drops") {
    assert(extractOne(
      "<SCRIPT type=\"module\" async>\nline one\nline two\n</SCRIPT><p>kept words make five tokens</p>") ===
      "kept words make five tokens")
  }

  test("block tags split lines; inline tags do not") {
    val html = "<div>first line has five words</div><span>second</span> line <b>also</b> has five words"
    assert(extractOne(html) === "first line has five words\nsecond line also has five words")
  }

  test("density filter: 5 tokens keep, 4 drop — boilerplate chrome falls out") {
    assert(extractOne("<p>one two three four five</p><p>one two three four</p>") ===
      "one two three four five")
    assert(extractOne("<nav><li>Home</li><li>About</li></nav><footer>© 2024 corp</footer>") === "")
  }

  test("entities decode in ONE pass; no nested escape ever double-decodes") {
    assert(extractOne("<p>a &lt;tag&gt; &quot;q&quot; &apos;s&apos; x&nbsp;y &amp; z</p>") ===
      "a <tag> \"q\" 's' x y & z")
    // double-escaped named entity: &amp;lt; -> &lt; (NOT '<')
    assert(extractOne("<p>escaped &amp;lt;literal entity shown here</p>") ===
      "escaped &lt;literal entity shown here")
    // double-escaped NUMERIC ampersand (round-11 advisor case): the
    // old numeric-first chain turned &#38;lt; into '<'; a single-pass
    // decoder yields the literal &lt;
    assert(extractOne("<p>numeric escape &#38;lt;literal stays put here</p>") ===
      "numeric escape &lt;literal stays put here")
    assert(extractOne("<p>also hex escape &#x26;amp;literal stays put here</p>") ===
      "also hex escape &amp;literal stays put here")
    // numeric dec + hex, out-of-range stays literal
    assert(extractOne("<p>grade &#65;&#x42; and bogus &#1114112; reference kept</p>") ===
      "grade AB and bogus &#1114112; reference kept")
  }

  test("CDATA unwraps to its payload") {
    assert(extractOne("<div><![CDATA[cdata payload kept as plain words]]></div>") ===
      "cdata payload kept as plain words")
  }

  test("broken markup degrades deterministically, never throws") {
    // unclosed tag eats to the NEXT '>', then normal text resumes
    assert(extractOne("<p>broken <markup attr=\"x </p><p>tail words reach five easily</p>") ===
      "broken tail words reach five easily")
    // a dangling '<' with no '>' at all stays literal text
    assert(extractOne("<p>left alone: a < b forever and always</p>") ===
      "left alone: a < b forever and always")
    // nested same-name tags: CLOSING tags are line breaks wherever
    // they appear (opening tags are inline — they carry no line-end
    // semantics); no parser state to corrupt
    assert(extractOne("<div><p>outer words one two three</p><p>inner words four five six</p></div>") ===
      "outer words one two three\ninner words four five six")
    assert(extractOne("<div>outer words one two three<div>inner words four five six</div></div>") ===
      "outer words one two threeinner words four five six")
  }

  test("whitespace runs collapse; blank and whitespace-only lines drop; NULL propagates") {
    assert(extractOne("<p>  spaced\t\tout   words \r here  now </p><p>   </p>") ===
      "spaced out words here now")
    import spark.implicits._
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(HtmlExtract.htmlExtract(col("t")).as("x")).collect().head
    assert(r.isNullAt(0))
  }

  test("interpreted eval matches codegen (both paths exercised)") {
    import spark.implicits._
    val html = "<p>one two three four five &amp; six</p><script>x</script>"
    val viaDf = extractOne(html)
    val interpreted = HtmlExtractExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(html))
      .eval(null).toString
    assert(viaDf === interpreted)
  }
}
