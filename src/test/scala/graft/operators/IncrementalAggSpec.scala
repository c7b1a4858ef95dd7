package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class IncrementalAggSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  // Fixture values are deliberately BINARY-EXACT (small dyadic
  // rationals): the split-recompute and associativity tests assert
  // bit-exact equality of the double `sum`, which holds for any
  // summation order only when every partial sum is exactly
  // representable. Arbitrary decimal values could differ from the full
  // recompute in low-order bits (IEEE addition is not associative) —
  // headroom the query layer's round(+1e-9) render absorbs.
  private val rows = Seq(
    ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
    ("b", Some(-2.0)),
    ("c", None), ("c", None),            // all-NULL values
    (null, Some(4.0)), (null, Some(6.0)), // NULL grouping key
    ("d", Some(7.5)), ("d", Some(0.5)), ("d", Some(7.5)))

  private def df(xs: Seq[(String, Option[Double])]) = xs.toDF("k", "v")

  private def collectState(s: org.apache.spark.sql.DataFrame) =
    s.collect().map(r => r.getString(0) ->
      ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap

  test("any split of the input merges to the full recompute") {
    val full = collectState(
      IncrementalAgg.aggState(df(rows), Seq(col("k")), col("v")))
    for (cut <- 0 to rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = collectState(IncrementalAgg.merge(
        IncrementalAgg.aggState(df(l), Seq(col("k")), col("v")),
        IncrementalAgg.aggState(df(r), Seq(col("k")), col("v")),
        Seq("k")))
      assert(merged === full, s"cut=$cut")
    }
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val (a, bc) = rows.splitAt(3)
    val (b, c) = bc.splitAt(3)
    val Seq(sa, sb, sc) = Seq(a, b, c).map(x =>
      IncrementalAgg.aggState(df(x), Seq(col("k")), col("v")))
    val left = collectState(
      IncrementalAgg.merge(IncrementalAgg.merge(sa, sb, Seq("k")), sc, Seq("k")))
    val right = collectState(
      IncrementalAgg.merge(sa, IncrementalAgg.merge(sb, sc, Seq("k")), Seq("k")))
    assert(left === right)
  }

  test("all-NULL and absent keys: cnt 0, NULL stats, NULL-safe merge") {
    val s = collectState(IncrementalAgg.aggState(df(rows), Seq(col("k")), col("v")))
    assert(s("c") === ((0L, None, None, None)))
    // a key present on only one side keeps its stats through the merge
    val onlyLeft = IncrementalAgg.merge(
      IncrementalAgg.aggState(df(rows), Seq(col("k")), col("v")),
      IncrementalAgg.aggState(df(Seq(("zz", Some(9.0)))), Seq(col("k")), col("v")),
      Seq("k"))
    val m = collectState(onlyLeft)
    assert(m("a") === s("a") && m("zz") === ((1L, Some(9.0), Some(9.0), Some(9.0))))
  }

  test("finalize derives avg from (sum, cnt); NULL for cnt 0") {
    val fin = IncrementalAgg.finalize(
        IncrementalAgg.aggState(df(rows), Seq(col("k")), col("v")), Seq("k"))
      .collect().map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(fin("a") === Some(2.0))
    assert(fin("c") === None)
  }
}
