package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class Scd2Spec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (key, ts, id, attr) — deliberately nasty: equal-ts ties (k2),
    * consecutive duplicates to collapse (k1), NULL attrs incl. a NULL
    * FIRST event (k3) and NULL→NULL runs, a single-event key (k4). */
  private lazy val log = Seq(
    (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
    (1L, ts("2024-01-02 00:00:00"), 2L, Some("a")),
    (1L, ts("2024-01-03 00:00:00"), 3L, Some("b")),
    (1L, ts("2024-01-04 00:00:00"), 4L, Some("b")),
    (1L, ts("2024-01-05 00:00:00"), 5L, Some("a")),
    (2L, ts("2024-01-01 12:00:00"), 6L, Some("x")),
    (2L, ts("2024-01-01 12:00:00"), 7L, Some("y")), // same ts, id breaks tie
    (2L, ts("2024-01-02 12:00:00"), 8L, Some("y")),
    (3L, ts("2024-01-01 00:00:00"), 9L, None), // NULL first event
    (3L, ts("2024-01-02 00:00:00"), 10L, None), // NULL extends the run
    (3L, ts("2024-01-03 00:00:00"), 11L, Some("z")),
    (3L, ts("2024-01-04 00:00:00"), 12L, None), // back to NULL = new version
    (4L, ts("2024-01-02 00:00:00"), 13L, Some("solo")))
    .toDF("k", "t", "id", "attr")

  private def build(df: DataFrame): DataFrame =
    Scd2.fromChangeLog(df, "k", "t", "id", Seq("attr"))

  private def collectSorted(df: DataFrame): Seq[String] =
    df.orderBy($"k", $"version_no").collect().toSeq.map(_.toString)

  test("fromChangeLog: collapse, ties, NULL runs, validity chain") {
    val out = build(log)
    val k1 = out.filter($"k" === 1L).orderBy($"version_no")
      .select($"version_no", $"attr", $"valid_from", $"last_seen_ts", $"valid_to", $"is_current")
      .collect()
    assert(k1.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(k1.map(_.getString(1)).toSeq === Seq("a", "b", "a"))
    // the a-run spans two events: valid_from=Jan1, last_seen=Jan2
    assert(k1(0).getTimestamp(2) === ts("2024-01-01 00:00:00"))
    assert(k1(0).getTimestamp(3) === ts("2024-01-02 00:00:00"))
    // valid_to = next version's valid_from; only the last row is open
    assert(k1(0).getTimestamp(4) === ts("2024-01-03 00:00:00"))
    assert(k1.map(_.getBoolean(5)).toSeq === Seq(false, false, true))

    // equal-ts tie: id 6 (x) before id 7 (y) → two versions, x closed at the SAME ts
    val k2 = out.filter($"k" === 2L).orderBy($"version_no")
      .select($"attr", $"valid_from", $"valid_to").collect()
    assert(k2.map(_.getString(0)).toSeq === Seq("x", "y"))
    assert(k2(0).getTimestamp(1) === k2(0).getTimestamp(2))

    // NULL-attr first version exists and NULL→z→NULL gives three versions
    val k3 = out.filter($"k" === 3L).orderBy($"version_no")
      .select($"version_no", $"attr").collect()
    assert(k3.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(k3.map(r => Option(r.getString(1))).toSeq === Seq(None, Some("z"), None))

    // single-event key: one open version, last_seen == valid_from
    val k4 = out.filter($"k" === 4L).collect()
    assert(k4.length === 1 && k4(0).getAs[Boolean]("is_current"))
    assert(k4(0).getAs[Timestamp]("last_seen_ts") === k4(0).getAs[Timestamp]("valid_from"))
  }

  test("applyIncrement == full-log rebuild, for every time split") {
    val full = collectSorted(build(log))
    val cuts = Seq("2024-01-01 06:00:00", "2024-01-01 12:00:00",
      "2024-01-02 00:00:00", "2024-01-03 00:00:00", "2024-01-04 12:00:00")
    for (c <- cuts) {
      val cut = lit(c).cast("timestamp")
      val dim = build(log.filter($"t" < cut))
      val merged = Scd2.applyIncrement(dim, log.filter($"t" >= cut),
        "k", "t", "id", Seq("attr"))
      assert(collectSorted(merged) === full, s"split at $c diverged")
    }
  }

  test("increment with only-new keys and attr-equal (collapsing) updates") {
    val dim = build(log)
    val inc = Seq(
      (1L, ts("2024-01-06 00:00:00"), 20L, Some("a")), // same attr → extends current
      (9L, ts("2024-01-06 00:00:00"), 21L, Some("new"))) // brand-new key
      .toDF("k", "t", "id", "attr")
    val merged = Scd2.applyIncrement(dim, inc, "k", "t", "id", Seq("attr"))
    assert(collectSorted(merged) === collectSorted(build(log.union(inc))))
    // k1 still has 3 versions; the current one extended its last_seen
    val k1cur = merged.filter($"k" === 1L && $"is_current").collect()
    assert(k1cur.length === 1)
    assert(k1cur(0).getAs[Timestamp]("last_seen_ts") === ts("2024-01-06 00:00:00"))
    assert(merged.filter($"k" === 1L).count() === 3L)
  }

  test("out-of-order increment is refused, not silently merged") {
    val dim = build(log)
    // k1's current version last saw 2024-01-05; an update AT that ts is late
    val late = Seq((1L, ts("2024-01-05 00:00:00"), 30L, Some("c")))
      .toDF("k", "t", "id", "attr")
    val e = intercept[IllegalArgumentException] {
      Scd2.applyIncrement(dim, late, "k", "t", "id", Seq("attr"))
    }
    assert(e.getMessage.contains("out-of-order"))
    // …but the same ts is fine for a key it does not touch
    val ok = Seq((4L, ts("2024-01-05 00:00:00"), 31L, Some("c")))
      .toDF("k", "t", "id", "attr")
    Scd2.applyIncrement(dim, ok, "k", "t", "id", Seq("attr")).collect()
  }

  test("randomized: merge == rebuild over 20 random logs × 3 cuts each (seeded)") {
    val rng = new scala.util.Random(20240814L)
    val attrs = Array(Some("a"), Some("b"), Some("c"), None)
    for (trial <- 1 to 20) {
      // random log: 5 keys, 1-12 events each, second-granularity ts in a
      // 2-day range (collisions likely → tie-break exercised), attrs
      // from a 4-letter alphabet incl. NULL (runs collapse)
      var id = 0L
      val rows = for {
        k <- 1L to 5L
        _ <- 0 until (1 + rng.nextInt(12))
      } yield {
        id += 1
        val t = ts("2024-01-01 00:00:00").getTime + rng.nextInt(48 * 3600) * 1000L
        (k, new Timestamp(t), id, attrs(rng.nextInt(attrs.length)))
      }
      val log = rows.toDF("k", "t", "id", "attr")
      val full = collectSorted(build(log))
      val tsSorted = rows.map(_._2.getTime).distinct.sorted
      for (_ <- 1 to 3) {
        // cut at a random observed ts: history strictly before, increment at/after
        val cutMs = tsSorted(rng.nextInt(tsSorted.length))
        val cut = new Timestamp(cutMs)
        val hist = log.filter($"t" < lit(cut))
        if (hist.limit(1).count() > 0) { // empty dims are a different operator contract
          val merged = Scd2.applyIncrement(build(hist),
            log.filter($"t" >= lit(cut)), "k", "t", "id", Seq("attr"))
          assert(collectSorted(merged) === full,
            s"trial $trial cut $cut diverged (seed fixed — reproducible)")
        }
      }
    }
  }

  test("lookup: interval semantics at every boundary class") {
    val dim = build(log)
    val facts = Seq(
      (100L, 1L, ts("2023-12-31 00:00:00")), // before k1's first version → NULL
      (101L, 1L, ts("2024-01-01 00:00:00")), // exactly valid_from → v1 (a)
      (102L, 1L, ts("2024-01-02 23:00:00")), // inside v1 → a
      (103L, 1L, ts("2024-01-03 00:00:00")), // exactly v1's valid_to → v2 (b)
      (104L, 1L, ts("2024-06-01 00:00:00")), // far future → current (a, v3)
      (105L, 2L, ts("2024-01-01 12:00:00")), // zero-width x@t superseded by y@t → y
      (106L, 9L, ts("2024-01-01 00:00:00"))) // unknown key → NULL
      .toDF("fid", "k", "ft")
    val out = Scd2.lookup(facts, dim, key = "k", factTs = "ft",
        payload = Seq("version_no" -> "vn", "attr" -> "attr_at"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4)))).toMap
    assert(out(100L) === (None, None))
    assert(out(101L) === (Some(1L), Some("a")))
    assert(out(102L) === (Some(1L), Some("a")))
    assert(out(103L) === (Some(2L), Some("b")))
    assert(out(104L) === (Some(3L), Some("a")))
    assert(out(105L) === (Some(2L), Some("y")))
    assert(out(106L) === (None, None))
  }

  test("NULL-keyed updates are refused (two version chains would collide)") {
    val dim = build(log)
    val nullKey = Seq((Option.empty[Long], ts("2024-01-09 00:00:00"), 50L, Some("x")))
      .toDF("k", "t", "id", "attr")
    val e = intercept[IllegalArgumentException] {
      Scd2.applyIncrement(dim, nullKey, "k", "t", "id", Seq("attr"))
    }
    assert(e.getMessage.contains("NULL-keyed"))
    // …while fromChangeLog itself handles NULL keys as a normal group
    val withNull = log.union(nullKey)
    assert(build(withNull).filter($"k".isNull).count() === 1L)
  }

  test("untouched keys pass through byte-identical") {
    val dim = build(log)
    val inc = Seq((2L, ts("2024-01-07 00:00:00"), 40L, Some("y")))
      .toDF("k", "t", "id", "attr")
    val merged = Scd2.applyIncrement(dim, inc, "k", "t", "id", Seq("attr"))
    val before = collectSorted(dim.filter($"k" =!= 2L))
    val after = collectSorted(merged.filter($"k" =!= 2L))
    assert(after === before)
  }
}
