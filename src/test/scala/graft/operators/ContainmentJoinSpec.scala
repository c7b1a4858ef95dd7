package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport

/** Exact containment join (t77): hand-computed containments incl. the
  * exact-τ boundary, small→big orientation, below-threshold exclusion,
  * and the losslessness of the prefix blocking against a brute-force
  * all-pairs recount. Cross-engine: the t77 oracle (pure quadratic
  * semantics — no blocking replay needed). */
class ContainmentJoinSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def w(ids: Range) = ids.map(i => s"w$i").mkString(" ")

  // shingles are word 3-grams; doc text built from disjoint word ranges
  private def corpus = Seq(
    (1L, w(0 to 11)), // 10 shingles, fully inside doc 2
    (2L, w(0 to 31)), // 30 shingles
    (3L, w(0 to 8) + " zz " + w(40 to 45)), // shares exactly the w0..w8 trigrams with 2
    (4L, w(100 to 111)), // disjoint
    (5L, w(0 to 11)) // duplicate of 1 (equal sizes, id tie-break)
  ).toDF("doc_id", "text")

  private def run(tauP: Int, tauQ: Int) =
    Dedup.containmentJoin(corpus, col("text"), col("doc_id"), n = 3, tauP, tauQ)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("hand-computed containments, orientation, and exclusion") {
    val got = run(7, 10)
    // doc1 ⊂ doc2 fully: containment 1.0; doc5 == doc1 (ties by id)
    assert(got.contains((1L, 2L, 1.0)))
    assert(got.contains((5L, 2L, 1.0)))
    assert(got.contains((1L, 5L, 1.0)), "equal-size duplicate pairs emit a < b")
    assert(!got.exists(p => p._1 == 2L && p._2 == 1L), "orientation is small->big")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "disjoint doc must not pair")
    // doc3 vs doc2: shared 3-grams = the w0..w8 run -> 7 of doc3's 14 -> 0.5 < 0.7
    assert(!got.exists(p => p._1 == 3L && p._2 == 2L))
  }

  test("exact-boundary pairs survive (integer threshold, no float)") {
    // tau = 1/2: doc3->doc2 shares exactly 7 of its 14 shingles
    val got = run(1, 2)
    val p = got.find(x => x._1 == 3L && x._2 == 2L)
    assert(p.isDefined, s"boundary pair missing: $got")
    assert(math.abs(p.get._3 - 0.5) < 1e-9)
  }

  test("prefix blocking is lossless vs brute-force all-pairs") {
    // brute force from the same shingle kernel
    val sets = corpus.select(col("doc_id"),
        array_distinct(graft.expressions.TextHash.shingleHashes(col("text"), 3)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && (sa.size < sb.size || (sa.size == sb.size && a < b))
      inter = sa.intersect(sb).size
      if inter * 10 >= sa.size * 7
    } yield (a, b)
    assert(run(7, 10).map(p => (p._1, p._2)) === brute.toSet)
  }
}
