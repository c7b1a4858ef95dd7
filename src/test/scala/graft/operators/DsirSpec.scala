package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport

/** DSIR importance-resampling contract (t72): the fitted log-ratios
  * equal a brute-force recount, scoring equals the brute-force fold,
  * the weight actually separates target-like from raw-like text, and
  * the scoring plan is shuffle-free (the scale claim). The cross-engine
  * half (DuckDB replaying fit + fold) is the t72 oracle. */
class DsirSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  // two sublanguages: "target-ish" docs draw from words t0..t9,
  // "raw-ish" from r0..r19; the target predicate marks the former
  private def corpus = (1 to 120).map { i =>
    val target = i % 3 == 0
    val words =
      if (target) Seq.tabulate(12)(j => s"t${(i + j) % 10}")
      else Seq.tabulate(12)(j => s"r${(i * 5 + j) % 20}")
    (i.toLong, words.mkString(" "), target)
  }.toDF("id", "text", "is_target")

  private def bruteRatios(rows: Seq[(Long, String, Boolean)]): Array[Double] = {
    val d = Dsir.D
    val cr = new Array[Long](d)
    val ct = new Array[Long](d)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Int = {
      md.reset()
      val h = md.digest(g.getBytes("UTF-8"))
      (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % d
    }
    for ((_, text, target) <- rows) {
      val toks = text.trim.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val grams = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      for (g <- grams) {
        val b = bucket(g)
        cr(b) += 1
        if (target) ct(b) += 1
      }
    }
    val tr = cr.sum
    val tt = ct.sum
    Array.tabulate(d)(b =>
      math.log((ct(b) + 1.0) / (tt + d.toDouble)) -
        math.log((cr(b) + 1.0) / (tr + d.toDouble)))
  }

  test("fitted log-ratios equal the brute-force recount") {
    val rows = (1 to 120).map { i =>
      val target = i % 3 == 0
      val words =
        if (target) Seq.tabulate(12)(j => s"t${(i + j) % 10}")
        else Seq.tabulate(12)(j => s"r${(i * 5 + j) % 20}")
      (i.toLong, words.mkString(" "), target)
    }
    val lam = Dsir.fitLogRatios(corpus, col("text"), col("is_target"))
    val brute = bruteRatios(rows)
    assert(lam.length === Dsir.D)
    for (b <- 0 until Dsir.D)
      assert(lam(b) === brute(b), s"lambda mismatch at bucket $b")
  }

  test("weights separate target-like from raw-like documents") {
    val lam = Dsir.fitLogRatios(corpus, col("text"), col("is_target"))
    val scored = Dsir.score(corpus, col("text"), col("id"), lam, threshold = 0.0)
      .join(corpus.select(col("id"), col("is_target")), "id")
      .collect()
    val (t, r) = scored.partition(_.getBoolean(3))
    val meanT = t.map(_.getDouble(1)).sum / t.length
    val meanR = r.map(_.getDouble(1)).sum / r.length
    assert(meanT > 0.0 && meanR < 0.0,
      s"no separation: target mean $meanT, raw mean $meanR")
    // every selected flag derives from the rounded weight
    for (row <- scored)
      assert(row.getBoolean(2) === (row.getDouble(1) > 0.0))
  }

  test("fit is invariant to partitioning; empty and null text score 0") {
    val lam1 = Dsir.fitLogRatios(corpus, col("text"), col("is_target"))
    val lam2 = Dsir.fitLogRatios(corpus.repartition(7), col("text"), col("is_target"))
    assert(lam1.toSeq === lam2.toSeq)
    val edge = Seq((1L, "", false), (2L, "   !!", false))
      .toDF("id", "text", "is_target")
      .union(Seq((3L, Option.empty[String], false)).toDF("id", "text", "is_target"))
    val out = Dsir.score(edge, col("text"), col("id"), lam1, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.0)) // null text filtered, empty folds to 0
  }

  test("scoring plan is shuffle-free (no Exchange)") {
    val lam = Dsir.fitLogRatios(corpus, col("text"), col("is_target"))
    val plan = Dsir.score(corpus, col("text"), col("id"), lam, threshold = 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring shuffled:\n$plan")
  }
}
