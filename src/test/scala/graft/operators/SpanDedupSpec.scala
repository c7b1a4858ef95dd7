package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** SpanDedup.duplicateSpans semantics on hand-built corpora: span
  * boundaries, overlap/abutment merging, the cross-document
  * requirement (intra-doc repeats alone never qualify), and the
  * short-document guard. Token offsets are in normalized-token space
  * (TextHashImpl.tokenize: lowercase alnum runs). */
class SpanDedupSpec extends AnyFunSuite with SparkTestSupport {

  private def spans(k: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SpanDedup.duplicateSpans(docs.toDF("id", "text"), col("text"), col("id"), k)
      .orderBy(col("id"), col("span_start"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  // 12 shared tokens surrounded by distinct prefixes/suffixes: with
  // k=4 the shared run yields 9 gram starts in each doc, merging into
  // ONE span covering exactly the shared tokens
  test("a shared verbatim run becomes one maximal span in both documents") {
    val shared = (0 until 12).map(i => s"common$i").mkString(" ")
    val a = s"alpha beta $shared gamma"
    val b = s"delta $shared epsilon zeta"
    val out = spans(4, 1L -> a, 2L -> b)
    // doc 1: shared tokens occupy offsets 2..13 -> span [2, 14)
    // doc 2: shared tokens occupy offsets 1..12 -> span [1, 13)
    assert(out === Seq((1L, 2L, 14L, 9L), (2L, 1L, 13L, 9L)))
  }

  test("two shared runs separated by unique text stay two spans; abutting windows merge") {
    val r1 = (0 until 5).map(i => s"head$i").mkString(" ")
    val r2 = (0 until 5).map(i => s"tail$i").mkString(" ")
    // doc 1 separates the runs with 6 unique tokens (> k so the spans
    // can't bridge); doc 2 carries them directly
    val a = s"$r1 u1 u2 u3 u4 u5 u6 $r2"
    val b = s"$r1 $r2 x y"
    val out = spans(4, 1L -> a, 2L -> b)
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1 === Seq((1L, 0L, 5L, 2L), (1L, 11L, 16L, 2L)))
    // in doc 2 the runs abut: gram windows tile the full 10 tokens...
    // every start 0..6 is a hit except those spanning the seam?
    // grams crossing the r1|r2 boundary exist ONLY in doc 2 -> not
    // cross-doc; hits are starts 0,1 and 5,6 -> but [0,5) and [5,10)
    // abut (start 5 == prevmax(1)+4) and merge into one span
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, 10L, 4L)))
  }

  test("intra-document repetition alone does not qualify") {
    val rep = (0 until 6).map(_ => "loop the chorus again").mkString(" ")
    val out = spans(4, 1L -> rep, 2L -> "totally different words here my friend")
    assert(out.isEmpty)
  }

  test("a gram shared cross-doc marks ALL its occurrences, including intra-doc repeats") {
    val g = "one two three four"
    val a = s"$g filler alpha beta gamma $g"
    val b = s"prefix tokens here $g"
    val out = spans(4, 1L -> a, 2L -> b)
    // doc 1 carries the gram at starts 0 and 8 -> two spans
    assert(out.filter(_._1 == 1L) === Seq((1L, 0L, 4L, 1L), (1L, 8L, 12L, 1L)))
    assert(out.filter(_._1 == 2L) === Seq((2L, 3L, 7L, 1L)))
  }

  test("documents shorter than k tokens emit nothing and break nothing") {
    val out = spans(8, 1L -> "too short", 2L -> "also short", 3L -> "")
    assert(out.isEmpty)
  }

  test("tokenization is normalized: case and punctuation do not defeat span matching") {
    val a = "The Quick, Brown Fox! jumps high today indeed"
    val b = "the quick brown fox jumps elsewhere entirely now"
    val out = spans(4, 1L -> a, 2L -> b)
    // shared normalized run: "the quick brown fox jumps" -> starts 0,1
    assert(out === Seq((1L, 0L, 5L, 2L), (2L, 0L, 5L, 2L)))
  }

  private def cuts(k: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long, String)] = {
    import spark.implicits._
    SpanDedup.cutDuplicateSpans(docs.toDF("id", "text"), col("text"), col("id"), k)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
  }

  test("cut: the globally first occurrence survives; the copy is removed; clean docs stay out of the patch") {
    val g = "one two three four"
    val out = cuts(4,
      1L -> s"alpha beta $g gamma delta",
      2L -> s"prefix $g suffix tail end",
      3L -> "entirely unrelated content sits here quietly")
    // doc 1 holds the canonical occurrence -> untouched -> absent
    assert(out === Seq((2L, 1L, 8L, 4L, "prefix suffix tail end")))
  }

  test("cut: intra-doc repeats inside the canonical document are cut too — exactly one copy survives globally") {
    val g = "one two three four"
    val out = cuts(4,
      1L -> s"$g filler alpha beta gamma $g",
      2L -> s"prefix tokens here $g")
    assert(out === Seq(
      (1L, 1L, 12L, 8L, "one two three four filler alpha beta gamma"),
      (2L, 1L, 7L, 3L, "prefix tokens here")))
  }

  test("cut: a fully duplicated document empties; the canonical copy never enters the patch") {
    val t = "zero one two three four five six seven"
    val out = cuts(4, 1L -> t, 2L -> t)
    assert(out === Seq((2L, 1L, 8L, 0L, "")))
  }
}
