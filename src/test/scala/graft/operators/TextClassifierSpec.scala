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
