package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** NFC normalization contract: Unicode canonical composition exactly
  * (compose what composes, leave compatibility characters and
  * zero-widths alone), NULL propagation, ASCII identity fast path, and
  * agreement with `java.text.Normalizer` as the ground truth the
  * kernel wraps. DuckDB's `nfc_normalize` is the oracle-side twin
  * (t48); both implement the same Unicode algorithm.
  *
  * Every non-ASCII codepoint is spelled as a unicode escape: a raw
  * literal could be saved by an editor in either normalization form,
  * silently inverting what a case tests. */
class TextNormSpec extends AnyFunSuite with SparkTestSupport {

  private def normalizeOne(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(TextNorm.nfcNormalize(col("t")).as("n"))
      .collect().head.getString(0)
  }

  test("decomposed sequences compose; compatibility chars and zero-widths survive") {
    // combining acute composes onto the base letter: e + U+0301 -> U+00E9
    assert(normalizeOne("cafe\u0301") === "caf\u00E9")
    // double-combining cluster composes PARTIALLY: e+ogonek+acute has
    // no precomposed form -- NFC yields U+0119 (e-ogonek) + acute
    assert(normalizeOne("e\u0328\u0301") === "\u0119\u0301")
    // NFC (canonical) must NOT apply compatibility folds: the fi
    // ligature, fullwidth A, and vulgar half all survive
    assert(normalizeOne("\uFB01le") === "\uFB01le")
    assert(normalizeOne("\uFF21bc") === "\uFF21bc")
    assert(normalizeOne("\u00BD") === "\u00BD")
    // zero-width space / ZWNJ / BOM are NOT whitespace to NFC
    assert(normalizeOne("a\u200Bb\u200Cc\uFEFFd") === "a\u200Bb\u200Cc\uFEFFd")
  }

  test("ASCII and already-normalized inputs are identity; NULL propagates; empty survives") {
    assert(normalizeOne("plain ascii 123") === "plain ascii 123")
    assert(normalizeOne("caf\u00E9") === "caf\u00E9") // already NFC
    assert(normalizeOne("") === "")
    import spark.implicits._
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(TextNorm.nfcNormalize(col("t")).as("n")).collect().head
    assert(r.isNullAt(0))
  }

  test("kernel agrees with java.text.Normalizer on mixed inputs") {
    import spark.implicits._
    val inputs = Seq(
      "cafe\u0301 au lait", // single combining
      "e\u0328\u0301",          // partial composition
      "A\u030Angstro\u0308m",          // ring + diaeresis compose
      "s\u0323\u0307",         // dot-below + dot-above (canonical reordering)
      "\u1E61\u0323",         // precomposed-with-dot-above + dot-below
      "ascii only",
      "\u0958",         // qa+nukta: composition EXCLUSION -- NFC re-DECOMPOSES it
      "q\u0323\u0307 mixed")
    val out = inputs.map(Tuple1(_)).toDF("t")
      .select(col("t"), TextNorm.nfcNormalize(col("t")).as("n"))
      .collect()
    out.foreach { r =>
      val expect = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) === expect, s"input ${r.getString(0)}")
    }
  }

  test("nfc_normalize is registered as a SQL function") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq(Tuple1("cafe\u0301")).toDF("t").createOrReplaceTempView("nfc_probe")
    val r = spark.sql("SELECT nfc_normalize(t) AS n FROM nfc_probe").collect().head
    assert(r.getString(0) === "caf\u00E9")
  }
}
