package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class RangeJoinSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // overlapping + nested + empty intervals; points on every boundary
  private lazy val intervals = Seq(
    ("a", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
    ("b", ts("2024-01-02 00:00:00"), ts("2024-01-02 12:00:00")), // nested in a
    ("c", ts("2024-01-02 06:00:00"), ts("2024-01-05 00:00:00")), // overlaps a, b
    ("d", ts("2024-02-01 00:00:00"), ts("2024-02-08 00:00:00"))  // matches nothing
  ).toDF("name", "lo", "hi")

  private lazy val points = Seq(
    (1L, ts("2024-01-01 00:00:00")), // lo of a (inclusive)
    (2L, ts("2024-01-02 00:00:00")), // lo of b, inside a
    (3L, ts("2024-01-02 11:59:59")), // inside a, b, c
    (4L, ts("2024-01-02 12:00:00")), // hi of b (exclusive), inside a, c
    (5L, ts("2024-01-03 00:00:00")), // hi of a (exclusive), inside c
    (6L, ts("2024-01-04 23:59:59")), // last second of c
    (7L, ts("2024-01-05 00:00:00")), // hi of c (exclusive) — no match
    (8L, ts("2023-06-01 00:00:00"))  // far outside everything
  ).toDF("id", "pt")

  private def naive = points
    .join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
    .select("id", "name").orderBy("id", "name")
    .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def grid(cellMicros: Long) = RangeJoin
    .pointInInterval(points, col("pt"), intervals, col("lo"), col("hi"), cellMicros)
    .select("id", "name").orderBy("id", "name")
    .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("matches the nested-loop reference on boundaries, nesting, and overlap") {
    val expected = Seq(1L -> "a", 2L -> "a", 2L -> "b", 3L -> "a", 3L -> "b",
      3L -> "c", 4L -> "a", 4L -> "c", 5L -> "c", 6L -> "c")
    assert(naive === expected) // the reference itself is what we think it is
    assert(grid(86400L * 1000000L) === expected)
  }

  test("result is cell-width independent (no dup when intervals span many cells)") {
    val expected = naive
    // 1 s cells: interval c spans ~260k cells; 1 h; 1 day; a prime width
    for (w <- Seq(1000000L, 3600L * 1000000L, 86400L * 1000000L, 9999999937L))
      assert(grid(w) === expected, s"cellMicros=$w")
  }

  test("pre-1970 epochs: trunc-div cells still never miss or duplicate a match") {
    val negIntervals = Seq(("x", ts("1969-12-30 00:00:00"), ts("1970-01-02 00:00:00")))
      .toDF("name", "lo", "hi")
    val negPoints = Seq(
      (1L, ts("1969-12-29 23:59:59")), // just before lo
      (2L, ts("1969-12-30 00:00:00")), // lo
      (3L, ts("1969-12-31 23:59:59")), // negative epoch inside
      (4L, ts("1970-01-01 00:00:00")), // epoch zero inside
      (5L, ts("1970-01-02 00:00:00"))  // hi (exclusive)
    ).toDF("id", "pt")
    val got = RangeJoin.pointInInterval(
        negPoints, col("pt"), negIntervals, col("lo"), col("hi"), 3600L * 1000000L)
      .select("id", "name").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq(2L -> "x", 3L -> "x", 4L -> "x"))
  }

  // second interval set for the overlap join: adjacency (half-open ⇒
  // no overlap), containment, multi-cell spans, and a disjoint tail
  private lazy val rights = Seq(
    ("r1", ts("2024-01-02 12:00:00"), ts("2024-01-04 00:00:00")), // overlaps a, c; ADJACENT to b
    ("r2", ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")), // inside a only
    ("r3", ts("2023-12-25 00:00:00"), ts("2024-02-15 00:00:00")), // contains everything
    ("r4", ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))  // overlaps nothing
  ).toDF("rname", "rlo", "rhi")

  private def naiveOverlap = intervals
    .join(rights, col("lo") < col("rhi") && col("rlo") < col("hi"))
    .select("name", "rname").orderBy("name", "rname")
    .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  private def gridOverlap(cellMicros: Long) = RangeJoin
    .intervalOverlap(intervals, col("lo"), col("hi"),
      rights, col("rlo"), col("rhi"), cellMicros)
    .select("name", "rname").orderBy("name", "rname")
    .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("intervalOverlap matches the nested-loop reference; adjacency is NOT overlap") {
    val expected = Seq("a" -> "r1", "a" -> "r2", "a" -> "r3", "b" -> "r3",
      "c" -> "r1", "c" -> "r3", "d" -> "r3")
    assert(naiveOverlap === expected) // b↔r1 adjacent at 12:00 — excluded
    assert(gridOverlap(86400L * 1000000L) === expected)
  }

  test("intervalOverlap is cell-width independent — one credit cell per pair") {
    val expected = naiveOverlap
    // hour cells: a↔r3 shares ~48 cells, r3 spans ~1250 — still one row
    for (w <- Seq(3600L * 1000000L, 86400L * 1000000L, 9999999937L))
      assert(gridOverlap(w) === expected, s"cellMicros=$w")
  }

  test("intervalOverlap: EMPTY intervals ([x,x) and inverted) match nothing") {
    // regression: an empty interval still lands on its start cell
    // (sequence counts down), and the llo<rhi AND rlo<lhi predicate
    // accepts an empty interval strictly INSIDE the other side — the
    // lo<hi guard must drop these before the grid
    val empties = Seq(
      ("e1", ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:00")), // [x,x) inside a
      ("e2", ts("2024-01-05 00:00:00"), ts("2024-01-03 00:00:00"))  // inverted
    ).toDF("rname", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(intervals, col("lo"), col("hi"),
      empties, col("rlo"), col("rhi"), 3600L * 1000000L).collect()
    assert(got.isEmpty, s"empty intervals must never match: ${got.toSeq}")
    // and symmetrically on the left side
    val got2 = RangeJoin.intervalOverlap(empties.toDF("name", "lo", "hi"),
      col("lo"), col("hi"), rights, col("rlo"), col("rhi"), 3600L * 1000000L).collect()
    assert(got2.isEmpty)
  }

  test("intervalOverlap: randomized parity with the nested-loop reference (seeded)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val t0 = ts("2024-01-01 00:00:00").getTime
    def randIntervals(n: Int, tag: String) = (0 until n).map { i =>
      val lo = t0 + rng.nextInt(30 * 86400).toLong * 1000L
      val len = (1L + rng.nextInt(5 * 86400)) * 1000L
      (s"$tag$i", new Timestamp(lo), new Timestamp(lo + len))
    }
    val ls = randIntervals(120, "L").toDF("lname", "llo", "lhi")
    val rs = randIntervals(40, "R").toDF("rname", "rlo", "rhi")
    val expected = ls.join(rs, col("llo") < col("rhi") && col("rlo") < col("lhi"))
      .select("lname", "rname").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(expected.nonEmpty && expected.size < 120 * 40) // non-trivial fixture
    for (w <- Seq(3600L * 1000000L, 86400L * 1000000L)) {
      val got = RangeJoin.intervalOverlap(ls, col("llo"), col("lhi"),
          rs, col("rlo"), col("rhi"), w)
        .select("lname", "rname").collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.length === got.distinct.length, s"duplicates at cellMicros=$w")
      assert(got.toSet === expected, s"cellMicros=$w")
    }
  }
}
