package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class TextFunctionsSpec extends AnyFunSuite with SparkTestSupport {

  private def eval1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().get(0)
  }

  private def evalText(t: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(t).toDF("t").select(f(col("t")).as("v")).head().get(0)
  }

  test("normalizeText lowercases, collapses non-alnum runs, trims") {
    assert(evalText("  Hello,   WORLD!! 42 ", TextFunctions.normalizeText) === "hello world 42")
    assert(evalText("___", TextFunctions.normalizeText) === "")
  }

  test("tokenCount counts whitespace runs") {
    assert(evalText("one two  three\tfour", TextFunctions.tokenCount) === 4)
    assert(evalText("", TextFunctions.tokenCount) === 0)
  }

  test("fingerprint equals md5 of the normalized text") {
    val fp = evalText("Hello, World!", TextFunctions.fingerprint)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp === expected)
  }

  test("prefixFingerprint collides on shared prefixes only") {
    val a = evalText("The quick brown fox jumps over the lazy dog and keeps running onward",
      TextFunctions.prefixFingerprint(_, 30))
    val b = evalText("The quick brown fox jumps over a cliff",
      TextFunctions.prefixFingerprint(_, 30))
    val c = evalText("Entirely different text", TextFunctions.prefixFingerprint(_, 30))
    assert(a === b)
    assert(a !== c)
  }

  test("langId maps NULL text to 'und', like the oracle's CASE fold") {
    import spark.implicits._
    val out = Seq((1, Option.empty[String]), (2, Some("the cat and the dog is here")))
      .toDF("id", "text")
      .select(org.apache.spark.sql.functions.col("id"),
        TextFunctions.langId(org.apache.spark.sql.functions.col("text")).as("lang"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) === "und")
    assert(out(2) === "en")
  }

  test("langId picks the language with most stopword hits, und when none") {
    assert(evalText("the cat and the dog is in that house", TextFunctions.langId) === "en")
    assert(evalText("el perro de la casa que los gatos", TextFunctions.langId) === "es")
    assert(evalText("der hund und die katze ist nicht hier", TextFunctions.langId) === "de")
    assert(evalText("xyzzy plugh 12345", TextFunctions.langId) === "und")
  }

  test("qualityScore in [0,1], higher for long clean English prose") {
    val good = ("the and of to is in that it " * 10).trim
    val bad = "!!!@@@###"
    val gs = evalText(good, TextFunctions.qualityScore).asInstanceOf[Double]
    val bs = evalText(bad, TextFunctions.qualityScore).asInstanceOf[Double]
    assert(gs > bs)
    assert(gs >= 0.0 && gs <= 1.0 && bs >= 0.0 && bs <= 1.0)
  }

  test("redact tags emails, URLs, and number runs; clean text untouched") {
    assert(evalText("mail me at jo.doe+x@example.org today",
      TextFunctions.redact) === "mail me at <EMAIL> today")
    assert(evalText("see https://example.com/a?b=1 and http://x.io",
      TextFunctions.redact) === "see <URL> and <URL>")
    assert(evalText("call 555-123-4567 now", TextFunctions.redact) === "call <NUM> now")
    assert(evalText("nothing to hide 42", TextFunctions.redact) === "nothing to hide 42")
  }

  test("rollingFingerprint is deterministic and order-sensitive") {
    val a = evalText("alpha beta gamma", TextFunctions.rollingFingerprint)
    val b = evalText("alpha beta gamma", TextFunctions.rollingFingerprint)
    val c = evalText("gamma beta alpha", TextFunctions.rollingFingerprint)
    assert(a === b)
    assert(a !== c)
  }
}
