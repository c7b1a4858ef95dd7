package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport

/** Mergeable per-key quantile state: rank accuracy, merge invariance
  * up to the ε bound, and the NULL-skip contract. */
class QuantileStateSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  // values 0..9999 per key: the exact q-quantile is ~q*10000, and an
  // ε-accurate answer must land within ε*n = 10 ranks of it
  private lazy val df = (0 until 10000).flatMap(i =>
    Seq(("a", i.toDouble), ("b", (9999 - i).toDouble)))
    .toDF("k", "v")

  test("sketch answers every quantile within the ε rank bound, per key") {
    val st = QuantileState.sketch(df, "k", "v", eps = 0.001)
    for (k <- Seq("a", "b"); q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = QuantileState.query(st, k, q).get
      assert(math.abs(est - q * 9999) <= 0.002 * 10000 + 1,
        s"key $k q=$q est=$est")
    }
  }

  test("merged slice states answer within band — slicing invariance up to ε") {
    val slices = Seq(
      df.filter($"v" % 3 === 0), df.filter($"v" % 3 === 1), df.filter($"v" % 3 === 2))
    val merged = slices.map(QuantileState.sketch(_, "k", "v", eps = 0.001))
      .reduce(QuantileState.mergeStates)
    for (k <- Seq("a", "b"); q <- Seq(0.5, 0.9, 0.99)) {
      val est = QuantileState.query(merged, k, q).get
      assert(math.abs(est - q * 9999) <= 0.002 * 10000 + 1,
        s"key $k q=$q est=$est (merged)")
    }
    // merge count equals the single-pass count exactly (counts are additive)
    assert(merged("a").count === 10000L)
  }

  test("serialization round-trips; unseen keys query None") {
    val st = QuantileState.sketch(df.filter($"k" === "a"), "k", "v")
    val back = QuantileState.deserialize(QuantileState.serialize(st))
    assert(QuantileState.query(back, "a", 0.5) === QuantileState.query(st, "a", 0.5))
    assert(QuantileState.query(back, "zz", 0.5).isEmpty)
  }

  test("NULL keys and NULL values are skipped, not grouped or crashed") {
    val withNulls = Seq(
      (Option("a"), Option(1.0)), (Option("a"), Option(2.0)),
      (Option.empty[String], Option(3.0)), (Option("a"), Option.empty[Double]))
      .toDF("k", "v")
    val st = QuantileState.sketch(withNulls, "k", "v")
    assert(st.keySet === Set("a"))
    assert(st("a").count === 2L)
  }

  test("out-of-range eps is refused") {
    intercept[IllegalArgumentException] { QuantileState.sketch(df, "k", "v", eps = 0.0) }
    intercept[IllegalArgumentException] { QuantileState.sketch(df, "k", "v", eps = 0.6) }
  }
}
