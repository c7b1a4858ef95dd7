package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class SqSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private lazy val vecs = {
    val rng = new scala.util.Random(42L)
    (0L until 200L).map(i =>
      (i, Seq.fill(8)(rng.nextDouble() * 20 - 10) :+ 5.0)) // dim 8 random + 1 constant dim
      .toDF("id", "v")
  }

  test("dequantization error is bounded by scale/2 per dimension") {
    val r = Sq.train(vecs, $"v")
    assert(r.scales.last === 0.0, "constant dimension must train scale 0")
    val rows = vecs.collect().map(x => (x.getLong(0), x.getSeq[Double](1).toArray))
    val codes = Sq.encodeIndex(vecs, $"v", $"id", r)
      .collect().map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    for ((id, v) <- rows; i <- v.indices) {
      val deq = r.mins(i) + (codes(id)(i) & 0xff) * r.scales(i)
      val bound = math.max(r.scales(i) / 2, 1e-12)
      assert(math.abs(v(i) - deq) <= bound + 1e-9,
        s"id=$id dim=$i: |${v(i)} - $deq| > scale/2=$bound")
    }
  }

  test("train is ONE aggregate; ranges match the brute-force min/max") {
    val r = Sq.train(vecs.repartition(7), $"v")
    val raw = vecs.collect().map(_.getSeq[Double](1).toArray)
    for (i <- 0 until 9) {
      assert(r.mins(i) === raw.map(_(i)).min)
      assert(math.abs(r.mins(i) + 255 * r.scales(i) - raw.map(_(i)).max) <= 1e-9)
    }
  }

  test("sqKnn top-1 of a corpus member's own query is itself (error << spacing)") {
    val r = Sq.train(vecs, $"v")
    val index = Sq.encodeIndex(vecs, $"v", $"id", r)
    val q = vecs.filter($"id" === 17L).head().getSeq[Double](1).toArray
    val top = Sq.sqKnn(index, q, r, k = 3).collect()
    assert(top.head.getLong(0) === 17L,
      s"self-query must rank itself first, got ${top.toSeq}")
  }

  test("sqKnn recall@10 vs exact L2 is high on this corpus") {
    val r = Sq.train(vecs, $"v")
    val index = Sq.encodeIndex(vecs, $"v", $"id", r)
    val q = vecs.filter($"id" === 3L).head().getSeq[Double](1).toArray
    val approx = Sq.sqKnn(index, q, r, 10).collect().map(_.getLong(0)).toSet
    val exact = vecs.collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](1).toArray)
      .map { case (id, v) => id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum }
      .sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    assert((approx intersect exact).size >= 8,
      s"recall@10 < 0.8: approx=$approx exact=$exact")
  }

  test("out-of-range vectors clamp to the trained range instead of wrapping") {
    val r = Sq.train(vecs, $"v")
    val outlier = Seq((999L, Seq.fill(9)(1e6))).toDF("id", "v")
    val c = Sq.encodeIndex(outlier, $"v", $"id", r).head().getAs[Array[Byte]](1)
    assert(c.forall(b => (b & 0xff) == 255 || (b & 0xff) == 0),
      "values beyond max must clamp to 255 (or 0 on a constant dim)")
  }

  test("ragged input is refused, not silently mis-encoded") {
    val r = Sq.train(vecs, $"v")
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    intercept[Exception] {
      Sq.encodeIndex(bad, $"v", $"id", r).collect()
    }
  }
}
