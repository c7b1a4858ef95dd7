package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Snapshot reconciliation: status labeling, multi-column keys, the
  * narrow-shuffle design claim, and the internal-name guard. */
class TableDiffSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private lazy val a = Seq(
    (1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)).toDF("k", "s", "v")
  private lazy val b = Seq(
    (2L, "y", 2.0), (3L, "zz", 3.0), (4L, "w", 4.0)).toDF("k", "s", "v")

  test("diff labels added / removed / changed / same, one row per key") {
    val m = TableDiff.diff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("drift keeps only non-same; summary counts every status") {
    val drift = TableDiff.drift(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(drift === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val sum = TableDiff.summary(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("removed" -> 1L, "same" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("composite keys: a key-column change reads as remove+add, not change") {
    // with (k, s) as the key, 3/"z" → 3/"zz" is two different keys
    val m = TableDiff.diff(a, b, Seq("k", "s"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(m((1L, "x")) === "removed")
    assert(m((2L, "y")) === "same")
    assert(m((3L, "z")) === "removed")
    assert(m((3L, "zz")) === "added")
    assert(m((4L, "w")) === "added")
  }

  test("identical snapshots drift nothing; disjoint snapshots drift everything") {
    assert(TableDiff.drift(a, a, Seq("k"), Seq("s", "v")).isEmpty)
    val disjoint = TableDiff.diff(a, b.withColumn("k", col("k") + 100L),
      Seq("k"), Seq("s", "v")).collect().map(_.getString(1))
    assert(disjoint.count(_ == "removed") === 3)
    assert(disjoint.count(_ == "added") === 3)
  }

  test("payloads never cross the join: only keys and fingerprints are join inputs") {
    val df = TableDiff.diff(a, b, Seq("k"), Seq("s", "v"))
    val joined = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joined.nonEmpty)
    val joinInputs = joined.head.children.flatMap(_.output.map(_.name)).toSet
    assert(joinInputs === Set("k", "__fp_a", "__fp_b"),
      s"payload columns must be hashed below the join, saw $joinInputs")
  }

  test("randomized mutation sets are recovered exactly (seeded)") {
    val rng = new scala.util.Random(13)
    val base = (0L until 500L).map(k => (k, s"p$k", rng.nextDouble()))
    val removed = rng.shuffle(base.map(_._1).toList).take(60).toSet
    val changed = rng.shuffle(base.map(_._1).filterNot(removed).toList).take(80).toSet
    val added = (1000L until 1040L).toSet
    val aDf = base.toDF("k", "s", "v")
    val bRows = base.filterNot(r => removed(r._1))
      .map { case (k, s, v) => if (changed(k)) (k, s, v + 1.0) else (k, s, v) } ++
      added.toSeq.map(k => (k, s"new$k", 0.5))
    val bDf = bRows.toDF("k", "s", "v")
    val got = TableDiff.drift(aDf, bDf, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === removed.size + changed.size + added.size)
    removed.foreach(k => assert(got(k) === "removed", s"k=$k"))
    changed.foreach(k => assert(got(k) === "changed", s"k=$k"))
    added.foreach(k => assert(got(k) === "added", s"k=$k"))
    // and the untouched majority never surfaces
    assert(!got.keySet.exists(k => !removed(k) && !changed(k) && !added(k)))
  }

  test("NULL arrangements are changes, not collisions (xxhash64 skips null children)") {
    // a value MOVING between columns via NULLs must read as changed:
    // bare xxhash64(c1, c2) would hash (NULL,'x') and ('x',NULL)
    // identically because null children leave the running hash untouched
    val a2 = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("y"), Option.empty[String]),
      (3L, Option.empty[String], Option.empty[String]))
      .toDF("k", "s1", "s2")
    val b2 = Seq((1L, Option("x"), Option.empty[String]), // null-shift → changed
      (2L, Option("y"), Option.empty[String]), // identical incl. null → same
      (3L, Option.empty[String], Option.empty[String])) // all-null both sides → same
      .toDF("k", "s1", "s2")
    val m = TableDiff.diff(a2, b2, Seq("k"), Seq("s1", "s2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "changed", 2L -> "same", 3L -> "same"))
  }

  test("key columns colliding with internal fingerprint names are refused") {
    val bad = a.withColumnRenamed("k", "__fp_a")
    intercept[IllegalArgumentException] {
      TableDiff.diff(bad, bad, Seq("__fp_a"), Seq("s", "v"))
    }
  }
}
