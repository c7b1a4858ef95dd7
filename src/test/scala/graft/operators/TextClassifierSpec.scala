package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** TextClassifier: the distributed trainer's determinism claims —
  * bit-identical weights under any partitioning (integer-quantized
  * gradient sums), exact agreement with an independent sequential
  * replay of the update rule, and actual learning on a separable
  * fixture. */
class TextClassifierSpec extends AnyFunSuite with SparkTestSupport {

  // separable fixture: long repetitive docs (y=1) vs short distinct
  // ones (y=0) — length and dup-token features carry the signal
  private def fixture = {
    import spark.implicits._
    val longDoc = ("the quick brown fox " * 40).trim      // 160 toks, repetitive
    val shortDocs = Seq(
      "alpha beta gamma delta epsilon", "zeta eta theta iota kappa",
      "lambda mu nu xi omicron", "pi rho sigma tau upsilon")
    val docs = (1 to 8).map(i => (i.toLong, longDoc + s" marker$i", 1.0)) ++
      shortDocs.zipWithIndex.map { case (t, i) => ((100 + i).toLong, t, 0.0) }
    docs.toDF("id", "text", "y")
  }

  /** Sequential replay of fit()'s update rule in plain Scala — an
    * independent implementation (no Spark expressions) of the same
    * softsign link, 1e-6 gradient quantization, and left-assoc fold. */
  private def replayFit(rows: Seq[(Double, Array[Double])], lr: Double,
      rounds: Int): Array[Double] = {
    val d = rows.head._2.length
    var w = new Array[Double](d + 1)
    for (_ <- 1 to rounds) {
      val g = new Array[Long](d + 1)
      rows.foreach { case (y, x) =>
        var z = w(0)
        for (j <- 1 to d) z = z + x(j - 1) * w(j)
        val s = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))
        val m = s - y
        g(0) += math.floor(m * 1.0 * 1000000.0 + 0.5).toLong
        for (j <- 1 to d)
          g(j) += math.floor(m * x(j - 1) * 1000000.0 + 0.5).toLong
      }
      val n = rows.size.toDouble
      w = w.indices.map(j => w(j) - lr * (g(j).toDouble / (n * 1000000.0))).toArray
    }
    w
  }

  test("fit matches an independent sequential replay bit-exactly") {
    val df = fixture
    val w = TextClassifier.fit(df, col("text"), col("y"), lr = 8.0, rounds = 12)
    val feats = df.select(col("y"),
        array(TextClassifier.features(col("text")): _*).as("x"))
      .collect().map(r => (r.getDouble(0), r.getSeq[Double](1).toArray)).toSeq
    val expected = replayFit(feats, lr = 8.0, rounds = 12)
    assert(w.toSeq === expected.toSeq) // ==, not ≈: the whole contract
  }

  test("weights are bit-identical under any partitioning — the integer gradient sums commute") {
    val df = fixture
    val w1 = TextClassifier.fit(df.repartition(1), col("text"), col("y"), lr = 8.0, rounds = 10)
    val w7 = TextClassifier.fit(df.repartition(7, col("id")), col("text"), col("y"), lr = 8.0, rounds = 10)
    assert(w1.toSeq === w7.toSeq)
  }

  test("the classifier separates the fixture and score carries exact labels") {
    val df = fixture
    val w = TextClassifier.fit(df, col("text"), col("y"), lr = 8.0, rounds = 30)
    val out = TextClassifier.score(df, col("text"), col("id"), col("y"), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length === 12)
    assert(out.forall { case (_, y, _, pred) => y == pred },
      s"fixture must separate: ${out.mkString(", ")}")
    // scores live on the 1e-6 grid
    assert(out.forall { case (_, _, s, _) =>
      math.floor(s * 1000000.0 + 0.5) / 1000000.0 == s })
  }

  test("warm start is exact continuation: fit(a+b) == fitFrom(fit(a), b) on the same corpus") {
    val df = fixture
    val whole = TextClassifier.fit(df, col("text"), col("y"), lr = 8.0, rounds = 9)
    val a = TextClassifier.fit(df, col("text"), col("y"), lr = 8.0, rounds = 4)
    val resumed = TextClassifier.fitFrom(df, col("text"), col("y"), a, lr = 8.0, rounds = 5)
    assert(resumed.toSeq === whole.toSeq) // bit-exact: GD is memoryless beyond w
  }

  test("prCurve matches a hand-computed sweep and its accounting identities") {
    import spark.implicits._
    // scores sit mid-bin (never at a bin edge, where the inexact ×50
    // product could floor either way): bins 5→(y=0), 15→(y=1,y=0),
    // 45→(y=1,y=1), i.e. thresholds 0.1 / 0.3 / 0.9
    val scored = Seq(
      (1L, 0L, 0.11), (2L, 1L, 0.31), (3L, 0L, 0.316), (4L, 1L, 0.91), (5L, 1L, 0.918))
      .toDF("id", "y", "score")
    val out = TextClassifier.prCurve(scored)
      .orderBy(col("thr")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    assert(out === Seq(
      // thr 0.10: everything predicted positive
      (0.10, 3L, 2L, 0L, r6(3.0 / 5), 1.0, r6(2.0 * (3.0 / 5) * 1.0 / (3.0 / 5 + 1.0))),
      // thr 0.30: bins ≥ 15 → 4 rows, 3 true positives
      (0.30, 3L, 1L, 0L, r6(3.0 / 4), 1.0, r6(2.0 * (3.0 / 4) * 1.0 / (3.0 / 4 + 1.0))),
      // thr 0.90: only the two high-score positives
      (0.90, 2L, 0L, 1L, 1.0, r6(2.0 / 3), r6(2.0 * 1.0 * (2.0 / 3) / (1.0 + 2.0 / 3)))))
    // identities: tp+fn == total positives on every row; recall
    // non-increasing, precision rows well-formed
    assert(out.forall { case (_, tp, _, fn, _, _, _) => tp + fn == 3L })
    assert(out.map(_._6) === out.map(_._6).sorted.reverse)
  }

  test("fuzz: random corpora and labels — fit matches the sequential replay bit-exactly") {
    import spark.implicits._
    val vocab = Array("the", "and", "alpha", "beta", "gamma", "x9", "zz", "qq qq!!")
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val docs = (1 to 6 + rnd.nextInt(20)).map { i =>
        val len = rnd.nextInt(40)
        (i.toLong,
          Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "),
          if (rnd.nextBoolean()) 1.0 else 0.0)
      }
      val df = docs.toDF("id", "text", "y").repartition(1 + rnd.nextInt(5))
      val rounds = 1 + rnd.nextInt(12)
      val lr = Seq(2.0, 8.0, 16.0)(rnd.nextInt(3))
      val w = TextClassifier.fit(df, col("text"), col("y"), lr, rounds)
      val feats = df.select(col("y"),
          array(TextClassifier.features(col("text")): _*).as("x"))
        .collect().map(r => (r.getDouble(0), r.getSeq[Double](1).toArray)).toSeq
      assert(w.toSeq === replayFit(feats, lr, rounds).toSeq,
        s"trial $trial lr=$lr rounds=$rounds docs=$docs")
    }
  }

  test("degenerate inputs refuse loudly: empty training corpus, mismatched weight vector") {
    import spark.implicits._
    val empty = Seq((1L, null.asInstanceOf[String], 1.0)).toDF("id", "text", "y")
    val e1 = intercept[IllegalArgumentException] {
      TextClassifier.fit(empty, col("text"), col("y"), lr = 8.0, rounds = 1)
    }
    assert(e1.getMessage.contains("no non-null-text rows"))
    val e2 = intercept[IllegalArgumentException] {
      TextClassifier.score(fixture, col("text"), col("id"), col("y"), Array(0.0, 1.0))
    }
    assert(e2.getMessage.contains("weights must have"))
  }

  test("prCurve is defined on a corpus with zero positive labels — recall pins to 0") {
    import spark.implicits._
    val scored = Seq((1L, 0L, 0.11), (2L, 0L, 0.91)).toDF("id", "y", "score")
    val out = TextClassifier.prCurve(scored).orderBy(col("thr")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out === Seq((0.1, 0L, 0.0, 0.0, 0.0), (0.9, 0L, 0.0, 0.0, 0.0)))
  }

  test("null texts are excluded from training and scoring") {
    import spark.implicits._
    val df = fixture.unionByName(
      Seq((999L, null.asInstanceOf[String], 1.0)).toDF("id", "text", "y"))
    val w = TextClassifier.fit(df, col("text"), col("y"), lr = 8.0, rounds = 2)
    val wClean = TextClassifier.fit(fixture, col("text"), col("y"), lr = 8.0, rounds = 2)
    assert(w.toSeq === wClean.toSeq)
    assert(TextClassifier.score(df, col("text"), col("id"), col("y"), w)
      .filter(col("id") === 999L).count() === 0L)
  }
}
