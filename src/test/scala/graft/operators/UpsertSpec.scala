package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** MERGE-style snapshot refresh: update-wins / insert / carry-over
  * semantics of the one full-outer join. */
class UpsertSpec extends AnyFunSuite with SparkTestSupport {

  private lazy val snapshot = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
  }

  test("upsert: update wins on match, unmatched updates insert, rest carry over") {
    import spark.implicits._
    val updates = Seq((2L, "B", 200.0), (9L, "i", 90.0)).toDF("k", "name", "v")
    val got = Upsert.upsert(snapshot, updates, "k")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(got === Map(
      1L -> (("a", 10.0, "K")),
      2L -> (("B", 200.0, "U")), // every column comes from the update
      3L -> (("c", 30.0, "K")),
      9L -> (("i", 90.0, "I"))))
  }

  test("upsert: empty updates is the identity (all K)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
    val got = Upsert.upsert(snapshot, empty, "k").collect()
    assert(got.length === 3)
    assert(got.forall(_.getString(3) == "K"))
  }

  test("upsert: schema mismatch is an error, not a silent column drop") {
    import spark.implicits._
    val wrong = Seq((1L, "x")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(snapshot, wrong, "k")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("upsert: a NULL in a matched update column overwrites (update wins row-wide)") {
    import spark.implicits._
    val updates = Seq((2L, null: String, 200.0)).toDF("k", "name", "v")
    val got = Upsert.upsert(snapshot, updates, "k")
      .filter($"k" === 2L).collect().head
    assert(got.isNullAt(1), "matched update's NULL name must replace the snapshot value")
    assert(got.getDouble(2) === 200.0)
    assert(got.getString(3) === "U")
  }

  test("upsert: a NULL-keyed update row inserts with its payload (ANSI not-matched), never all-NULL 'K'") {
    import spark.implicits._
    val updates = Seq((Option.empty[Long], "dirty", 99.0)).toDF("k", "name", "v")
    val got = Upsert.upsert(snapshot, updates, "k").collect()
    assert(got.length === 4)
    val nullKeyed = got.filter(_.isNullAt(0))
    assert(nullKeyed.length === 1)
    // the presence-marker gate keeps the update's payload and tags 'I' —
    // a key-nullness gate would emit an all-NULL row tagged 'K'
    assert(nullKeyed.head.getString(1) === "dirty")
    assert(nullKeyed.head.getDouble(2) === 99.0)
    assert(nullKeyed.head.getString(3) === "I")
    // the real snapshot rows are untouched
    assert(got.filter(!_.isNullAt(0)).forall(_.getString(3) == "K"))
  }

  test("upsert: same names but different column types is an error") {
    import spark.implicits._
    val wrongTypes = Seq((1L, "x", 5)).toDF("k", "name", "v") // v: int, not double
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(snapshot, wrongTypes, "k")
    }
    assert(e.getMessage.contains("type mismatch"))
  }
}
