package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport
import graft.expressions.UnigramOps

/** Unigram-LM tokenizer contract (t73/t74): the Viterbi kernel equals
  * a brute-force enumeration over all vocab-valid segmentations under
  * the (cost, joined-seg) order, training keeps coverage (all single
  * chars) and learns real multi-char pieces, long words fall back to
  * chars, and serving is shuffle-free. The cross-engine half (DuckDB
  * replaying the whole EM + enumeration) is the t73/t74 oracle. */
class UnigramLmSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def jmap(m: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    m.foreach { case (k, v) => h.put(k, v) }
    h
  }

  /** All segmentations of w into vocab pieces (singles allowed via UNK). */
  private def enumerate(w: String, costs: Map[String, Long]): Seq[(Long, String)] = {
    if (w.isEmpty) return Seq((0L, ""))
    (1 to math.min(UnigramOps.MaxPiece, w.length)).flatMap { l =>
      val piece = w.substring(0, l)
      val c = costs.get(piece).orElse(
        if (l == 1) Some(UnigramOps.UnkCost) else None)
      c.toSeq.flatMap { pc =>
        enumerate(w.substring(l), costs).map { case (rc, rs) =>
          (pc + rc, if (rs.isEmpty) piece else piece + " " + rs)
        }
      }
    }
  }

  test("kernel segmentation equals brute-force (cost, seg) minimum") {
    val costs = Map(
      "a" -> 50L, "b" -> 60L, "c" -> 55L, "d" -> 70L,
      "ab" -> 90L, "bc" -> 80L, "abc" -> 140L, "cd" -> 100L,
      // engineered tie: "ab c" (90+55=145) vs "a bc" (50+80=130) vs "abc" (140)
      "ad" -> 120L)
    val words = Seq("abc", "abcd", "aabb", "dcba", "abab", "dddd",
      "abcabc", "a", "cdcd", "bbbb", "abcdabcd", "ddddddddddd")
    val vocab = jmap(costs)
    for (w <- words) {
      val brute = enumerate(w, costs).min
      val got = UnigramOps.segString(w, vocab)
      assert(got === brute._2, s"word $w: kernel $got vs brute ${brute._2}")
    }
  }

  test("engineered cost tie resolves by lexicographic joined segmentation") {
    // two distinct min-cost paths: "x y" and "xy" both cost 100
    val costs = Map("x" -> 50L, "y" -> 50L, "xy" -> 100L)
    val got = UnigramOps.segString("xy", jmap(costs))
    val brute = enumerate("xy", costs).min
    assert(got === brute._2)
    assert(got === "x y") // "x y" < "xy" lexicographically
  }

  test("long words fall back to single-char pieces; empty word is empty") {
    val vocab = jmap(Map("a" -> 1L))
    val long = "a" * (UnigramOps.MaxWord + 1)
    assert(UnigramOps.segString(long, vocab) === long.map(_.toString).mkString(" "))
    assert(UnigramOps.segString("", vocab) === "")
  }

  private def corpus = (1 to 100).map { i =>
    val words = Seq.tabulate(8)(j => Seq("customer", "order", "hash", "scan")((i + j) % 4))
    (i.toLong, words.mkString(" "))
  }.toDF("id", "text")

  test("fit keeps all single chars, learns multi-char pieces, counts positive") {
    val vocab = UnigramLm.fit(corpus, col("text"))
    val chars = "customerdhan".toSet // chars of the 4 corpus words
    for (c <- chars)
      assert(vocab.contains(c.toString), s"single char $c missing")
    assert(vocab.exists(_._1.length > 1), "no multi-char piece survived")
    assert(vocab.values.forall(_ > 0))
    // repartitioning must not change the fit (exact integer counts)
    val vocab2 = UnigramLm.fit(corpus.repartition(7), col("text"))
    assert(vocab === vocab2)
  }

  test("tokenStats: counts verified by hand; unknown chars served via UNK") {
    val vocab = UnigramLm.fit(corpus, col("text"))
    val costs = UnigramLm.costMap(vocab)
    val docs = Seq(
      (1L, "customer order"),
      (2L, "zzz customer"), // z unseen in training
      (3L, "   "),
      (4L, "a" * 20) // long-word fallback: 20 pieces
    ).toDF("id", "text")
    val out = UnigramLm.tokenStats(docs, col("text"), col("id"), vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def np(w: String) = UnigramOps.segString(w, costs).split(" ").length
    assert(out(1L) === ((2L, (np("customer") + np("order")).toLong)))
    assert(out(2L) === ((2L, (np("zzz") + np("customer")).toLong)))
    assert(!out.contains(3L)) // zero-token docs dropped
    assert(out(4L) === ((1L, 20L)))
  }

  test("serving plan is shuffle-free (no Exchange)") {
    val vocab = UnigramLm.fit(corpus, col("text"))
    val plan = UnigramLm.tokenStats(corpus, col("text"), col("id"), vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving shuffled:\n$plan")
  }
}
