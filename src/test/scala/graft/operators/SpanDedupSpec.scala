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

  // ---- incremental detection against a stored gram index (t51/s22) ----

  private def df(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("id", "text")
  }

  private val sharedOldNew = (0 until 8).map(i => s"common$i").mkString(" ")
  private val sharedNewNew = (0 until 8).map(i => s"fresh$i").mkString(" ")
  private val oldDocs = Seq(
    1L -> s"alpha beta $sharedOldNew gamma",
    2L -> "completely unrelated archive content sits here quietly")
  // new docs exercise every qualification case: old↔new (100), new↔new
  // (101/102), intra-doc repeat only (103 — must NOT qualify), clean (104)
  private val newDocs = Seq(
    100L -> s"intro $sharedOldNew outro",
    101L -> s"lead $sharedNewNew coda",
    102L -> s"$sharedNewNew trailing words here",
    103L -> "loop pattern here again loop pattern here again",
    104L -> "nothing shared with anyone at all today truly")

  test("incremental: spans against the stored index == full recompute restricted to the new docs") {
    val index = SpanDedup.gramIndex(df(oldDocs), col("text"), col("id"), k = 4)
    val inc = SpanDedup
      .spansAgainstIndex(df(newDocs), col("text"), col("id"), index, k = 4)
      .orderBy(col("id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val full = SpanDedup
      .duplicateSpans(df(oldDocs ++ newDocs), col("text"), col("id"), k = 4)
      .filter(col("id") >= 100L)
      .orderBy(col("id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(inc === full)
    // the fixture is live: old↔new and new↔new both fire, the
    // intra-doc-repeat-only and clean docs stay out
    assert(inc.map(_._1).distinct === Seq(100L, 101L, 102L))
  }

  test("gram index maintenance: folding increments reproduces the full rebuild under any slicing") {
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("gh")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val all = df(oldDocs ++ newDocs)
    val rebuild = rows(SpanDedup.gramIndex(all, col("text"), col("id"), k = 4))
    // two-way: old then new
    val twoWay = SpanDedup.mergeGramIndex(
      SpanDedup.gramIndex(df(oldDocs), col("text"), col("id"), k = 4),
      SpanDedup.gramIndex(df(newDocs), col("text"), col("id"), k = 4))
    assert(rows(twoWay) === rebuild)
    // uneven three-way slicing, folded left-to-right
    val slices = Seq(oldDocs.take(1), oldDocs.drop(1) ++ newDocs.take(2), newDocs.drop(2))
    val folded = slices.map(s => SpanDedup.gramIndex(df(s), col("text"), col("id"), k = 4))
      .reduce(SpanDedup.mergeGramIndex)
    assert(rows(folded) === rebuild)
  }

  private def cutInc(k: Int, old: Seq[(Long, String)], neu: Seq[(Long, String)]) = {
    val index = SpanDedup.gramIndex(df(old), col("text"), col("id"), k)
    SpanDedup.cutSpansAgainstIndex(df(neu), col("text"), col("id"), index, k)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
  }

  test("incremental cut: equals the full-corpus cut restricted to new docs when old ids precede") {
    val inc = cutInc(4, oldDocs, newDocs)
    val full = SpanDedup
      .cutDuplicateSpans(df(oldDocs ++ newDocs), col("text"), col("id"), k = 4)
      .filter(col("id") >= 100L)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(inc === full)
    // live fixture: the old↔new doc loses its shared run, the new↔new
    // pair keeps exactly one copy (in the lexicographically first doc)
    assert(inc.map(_._1) === Seq(100L, 102L))
  }

  test("incremental cut: the stored corpus wins even when a new doc's id would sort first") {
    val g = "alpha bravo charlie delta"
    // new id 5 < old id 10: a plain full recompute would keep doc 5's
    // copy and cut doc 10 — but doc 10 is PUBLISHED, so the increment's
    // copy must be the one cut (stored-corpus-wins)
    val out = cutInc(4,
      old = Seq(10L -> s"intro $g outro"),
      neu = Seq(5L -> s"start $g end words"))
    assert(out === Seq((5L, 1L, 7L, 3L, "start end words")))
  }

  test("incremental cut: an indexed gram cuts ALL increment occurrences, including intra-doc repeats") {
    val g = "one two three four"
    val out = cutInc(4,
      old = Seq(1L -> s"prefix $g suffix"),
      neu = Seq(100L -> s"$g middle filler words $g"))
    assert(out === Seq((100L, 2L, 11L, 3L, "middle filler words")))
  }

  test("incremental: a gram present only in ONE old and ONE new doc still qualifies via the index") {
    // the stored side's occurrence count is 1 — qualification must come
    // from index MEMBERSHIP, not from a ≥2 threshold on either side
    val g = "quick brown foxes jump"
    val index = SpanDedup.gramIndex(
      df(Seq(1L -> s"prefix $g suffix")), col("text"), col("id"), k = 4)
    val out = SpanDedup.spansAgainstIndex(
        df(Seq(200L -> s"start $g end")), col("text"), col("id"), index, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((200L, 1L, 5L)))
  }

  // ---- character-granularity exact-substring (t69/t70) -------------------

  private def charSpans(L: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SpanDedup.duplicateCharSpans(docs.toDF("id", "text"), col("text"), col("id"), L)
      .orderBy(col("id"), col("span_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  /** Independent in-spec reference: normalize (the regex twin of the
    * kernel's normalize), brute-force compare ACTUAL L-char substrings
    * across docs, merge qualifying window starts with the same run
    * rule. No hashes anywhere — a kernel hash bug cannot hide. */
  private def bruteCharSpans(L: Int, docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val norm = docs.map { case (id, t) =>
      (id, t.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", " ").trim)
    }
    val grams = norm.flatMap { case (id, t) =>
      (0 to t.length - L).map(i => (id, i, t.substring(i, i + L)))
    }
    val cross = grams.groupBy(_._3).values
      .filter(g => g.map(_._1).distinct.size >= 2).flatten.toSeq
    cross.groupBy(_._1).toSeq.flatMap { case (id, hits) =>
      val ss = hits.map(_._2).sorted
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // start,end,n
      for (s <- ss) runs.lastOption match {
        case Some((a, b, n)) if s <= b => runs(runs.length - 1) = (a, math.max(b, s + L), n + 1)
        case _ => runs += ((s, s + L, 1))
      }
      runs.map { case (a, b, n) => (id, a.toLong, b.toLong, n.toLong) }
    }.sorted
  }

  private def checkAgainstBrute(L: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long)] = {
    val got = charSpans(L, docs: _*)
    val want = bruteCharSpans(L, docs)
    assert(got === want, s"engine $got != brute-force substring reference $want")
    got
  }

  test("char spans: a shared substring below the token grid is found, offsets char-exact") {
    // the shared run is only 3 tokens — invisible to any k>=4 token
    // gram; flanks differ so the maximal run is exactly the fixture's
    val out = checkAgainstBrute(10,
      1L -> "alpha beta licence x9 42 gamma delta words",
      2L -> "zeta licence x9 42 eta theta more words here")
    assert(out.nonEmpty && out.map(_._1).distinct.sorted === Seq(1L, 2L))
    // both spans cover the SAME substring of their normalized docs
    val n1 = "alpha beta licence x9 42 gamma delta words"
    val n2 = "zeta licence x9 42 eta theta more words here"
    val Seq(s1, s2) = out.sortBy(_._1)
    assert(n1.substring(s1._2.toInt, s1._3.toInt) === n2.substring(s2._2.toInt, s2._3.toInt))
    assert(n1.substring(s1._2.toInt, s1._3.toInt).contains("licence x9 42"))
  }

  test("char spans: nested duplicates — doc with only the middle slice reports only it") {
    val mid = "the quick brown foxes jump over lazy dogs"
    val long = s"prefix padding $mid suffix padding tail"
    val out = checkAgainstBrute(12,
      1L -> s"aaa unique1 $long unique2",
      2L -> s"bbb other $long yet more",
      3L -> s"ccc $mid ddd")
    val d3 = out.filter(_._1 == 3L)
    assert(d3.size === 1, s"doc3: one maximal span expected, got $d3")
    assert(d3.head._3 - d3.head._2 >= mid.length,
      s"doc3 span must cover its whole slice: $d3")
    for (id <- Seq(1L, 2L)) {
      val s = out.filter(_._1 == id)
      assert(s.size === 1 && s.head._3 - s.head._2 >= long.length - 1,
        s"doc $id: one maximal span >= the long run, got $s")
    }
  }

  test("char spans: overlapping duplicates from different partners merge into one span") {
    // doc1 = A ++ B where A is shared with doc2 and B with doc3,
    // overlapping inside doc1 — doc1 must report ONE merged span
    val out = checkAgainstBrute(15,
      1L -> "first shared block of characters here second shared block too",
      2L -> "xxx first shared block of characters here yyy",
      3L -> "qqq characters here second shared block too zzz")
    assert(out.count(_._1 == 1L) === 1,
      s"doc1 must merge overlapping partner spans: ${out.filter(_._1 == 1L)}")
  }

  test("char spans: below-L sharing and intra-doc-only repetition emit nothing") {
    checkAgainstBrute(20,
      1L -> "short shared bit plus unique alpha text",
      2L -> "short shared bit plus other beta words")
    assert(checkAgainstBrute(30,
      1L -> "short shared bit unique alpha padding text",
      2L -> "short shared bit other beta words padding").isEmpty,
      "a sub-L shared run must not fire")
    val rep = "repeat this exact chorus line again and again " * 3
    assert(checkAgainstBrute(20, 1L -> rep,
      2L -> "completely different content with no overlap at all").isEmpty)
  }

  test("char spans: positions are normalized-space (case/punct changes don't defeat matching)") {
    val out = checkAgainstBrute(16,
      1L -> "AAA!! The-Licence_Header 2024 BBB",
      2L -> "ccc the licence header 2024 ddd")
    assert(out.size === 2, s"case/punct must not defeat matching: $out")
  }

  test("char spans incremental: against the stored char index == full recompute on the new docs") {
    val olds = Seq(1L -> "stored corpus document with the licence header block here",
      2L -> "another stored doc, unrelated content entirely my friend")
    val news = Seq(10L -> "new arrival carrying the licence header block here too",
      11L -> "fresh text with nothing shared at all anywhere")
    val index = SpanDedup.charGramIndex(df(olds), col("text"), col("id"), L = 20)
    val inc = SpanDedup.charSpansAgainstIndex(df(news), col("text"), col("id"), index, L = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    val full = charSpans(20, (olds ++ news): _*).filter(_._1 >= 10L)
    assert(inc === full, s"incremental $inc != full-recompute-restricted $full")
    assert(inc.nonEmpty && inc.forall(_._1 == 10L))
  }

  private def charCuts(L: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long, String)] = {
    import spark.implicits._
    SpanDedup.cutDuplicateCharSpans(docs.toDF("id", "text"), col("text"), col("id"), L)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
  }

  /** Brute reference for the char cut: same normalize, canonical =
    * min (id, start0) per actual-substring group, merge, then remove
    * covered chars one by one. */
  private def bruteCharCuts(L: Int, docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, String)] = {
    val norm = docs.map { case (id, t) =>
      (id, t.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", " ").trim)
    }
    val grams = norm.flatMap { case (id, t) =>
      (0 to t.length - L).map(i => (id, i, t.substring(i, i + L)))
    }
    val cuts = grams.groupBy(_._3).values
      .filter(g => g.map(_._1).distinct.size >= 2)
      .flatMap { g => val c = g.minBy(x => (x._1, x._2)); g.filterNot(_ == c) }
      .toSeq
    cuts.groupBy(_._1).toSeq.flatMap { case (id, hits) =>
      val ss = hits.map(_._2).distinct.sorted
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for (s <- ss) runs.lastOption match {
        case Some((a, b)) if s <= b => runs(runs.length - 1) = (a, math.max(b, s + L))
        case _ => runs += ((s, s + L))
      }
      val nt = norm.find(_._1 == id).get._2
      val clean = nt.zipWithIndex
        .filterNot { case (_, i) => runs.exists(r => i >= r._1 && i < r._2) }
        .map(_._1).mkString
      Seq((id, runs.size.toLong, nt.length.toLong, clean.length.toLong, clean))
    }.sortBy(_._1)
  }

  private def checkCutsAgainstBrute(L: Int, docs: (Long, String)*): Seq[(Long, Long, Long, Long, String)] = {
    val got = charCuts(L, docs: _*)
    val want = bruteCharCuts(L, docs)
    assert(got === want, s"engine $got != brute reference $want")
    got
  }

  test("char cut: globally first occurrence survives, the copy's chars are removed") {
    val shared = "the shared licence header block two"
    val out = checkCutsAgainstBrute(20,
      1L -> s"alpha $shared omega",
      2L -> s"beta $shared psi chi")
    // only doc 2 (the non-canonical copy) enters the patch
    assert(out.map(_._1) === Seq(2L))
    assert(!out.head._5.contains("licence header"), s"cut text leaked: ${out.head._5}")
    assert(out.head._4 < out.head._3)
  }

  test("char cut: a fully duplicated document empties; clean docs stay out of the patch") {
    val page = "entirely duplicated page content repeated verbatim in another document"
    val out = checkCutsAgainstBrute(20,
      1L -> page, 2L -> page,
      3L -> "a perfectly original document with its own words only")
    assert(out.map(_._1) === Seq(2L), s"only the copy is patched: $out")
    assert(out.head._4 === 0L && out.head._5 === "")
  }

  test("char cut: intra-doc repeats of a cross-doc window are cut beyond the canonical one") {
    val run = "chorus line repeated enough"
    val out = checkCutsAgainstBrute(20,
      1L -> s"$run and then $run once more",
      2L -> s"other doc also has $run inside")
    // doc 1 owns the canonical first occurrence; its SECOND occurrence
    // and doc 2's copy are both cut
    assert(out.map(_._1).toSet === Set(1L, 2L))
  }

  test("char spans plan gate: document text never enters an exchange (hash-only shuffles)") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, s"document number $i with the shared licence header block plus tail $i"))
      .toDF("id", "text")
    val exec = SpanDedup.duplicateCharSpans(docs, col("text"), col("id"), L = 20)
    exec.collect()
    val shuffles = exec.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toSeq
    assert(shuffles.nonEmpty, "expected at least one exchange (window partitioning)")
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle — hash-only exchanges, got:\n${shuffles.mkString("\n")}")
  }
}
