package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport

/** Insert-only join-view maintenance: the three-term delta rule,
  * the both-sides-new term naive maintenance forgets, composition
  * across increments, and empty-delta no-ops. */
class IncrementalJoinSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private lazy val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
  private lazy val bOld = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv")
  private lazy val dA = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
  private lazy val dB = Seq((2L, "b2"), (4L, "b4")).toDF("k", "bv")

  test("delta rule covers new×old, old×new, AND new×new pairs exactly once") {
    val view = aOld.join(bOld, "k") // {1}
    val maintained = rows(IncrementalJoin.applyDelta(view, aOld, dA, bOld, dB, Seq("k")))
    val rebuilt = rows(aOld.unionByName(dA).join(bOld.unionByName(dB), "k"))
    assert(maintained === rebuilt)
    // the both-sides-new pair (k=4) exists ONLY via the ΔA⋈ΔB term
    assert(maintained.contains((4L, "a4", "b4")))
    // dropping that term is the classic bug: prove it would lose k=4
    val naive = rows(view
      .unionByName(dA.join(bOld, "k"))
      .unionByName(aOld.join(dB, "k")))
    assert(!naive.contains((4L, "a4", "b4")) && naive + ((4L, "a4", "b4")) === rebuilt)
  }

  test("composition: two increments folded == one combined increment == rebuild") {
    val dA1 = dA.filter($"k" === 3L); val dA2 = dA.filter($"k" === 4L)
    val dB1 = dB.filter($"k" === 2L); val dB2 = dB.filter($"k" === 4L)
    val v0 = aOld.join(bOld, "k")
    // step 1 against (aOld, bOld); step 2 against the GROWN states
    val v1 = IncrementalJoin.applyDelta(v0, aOld, dA1, bOld, dB1, Seq("k"))
    val a1 = aOld.unionByName(dA1); val b1 = bOld.unionByName(dB1)
    val v2 = IncrementalJoin.applyDelta(v1, a1, dA2, b1, dB2, Seq("k"))
    val rebuilt = rows(aOld.unionByName(dA).join(bOld.unionByName(dB), "k"))
    assert(rows(v2) === rebuilt)
  }

  test("empty deltas are a no-op; one-sided increments need no other-side rows") {
    val v0 = aOld.join(bOld, "k")
    val emptyA = aOld.filter($"k" < 0L); val emptyB = bOld.filter($"k" < 0L)
    assert(rows(IncrementalJoin.applyDelta(v0, aOld, emptyA, bOld, emptyB, Seq("k"))) ===
      rows(v0))
    // single-sided (s16's shape): only ΔA arrives
    val oneSided = IncrementalJoin.applyDelta(v0, aOld, dA, bOld, emptyB, Seq("k"))
    assert(rows(oneSided) === rows(aOld.unionByName(dA).join(bOld, "k")))
  }

  test("delta sides carry broadcast hints (stored inputs never shuffle)") {
    val d = IncrementalJoin.delta(aOld, dA, bOld, dB, Seq("k"))
    val joins = d.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.size === 3, s"all three delta terms must broadcast:\n${d.queryExecution.sparkPlan}")
  }

  test("randomized increments: maintained view equals the rebuild (seeded)") {
    val rng = new scala.util.Random(31)
    def side(tag: String, n: Int) =
      (0 until n).map(i => (rng.nextInt(40).toLong, s"$tag$i"))
    val a0 = side("a", 60); val b0 = side("b", 25)
    val da = side("na", 20); val db = side("nb", 10)
    val a0Df = a0.toDF("k", "av"); val b0Df = b0.toDF("k", "bv")
    val daDf = da.toDF("k", "av"); val dbDf = db.toDF("k", "bv")
    val maintained = rows(IncrementalJoin.applyDelta(
      a0Df.join(b0Df, "k"), a0Df, daDf, b0Df, dbDf, Seq("k")))
    val rebuilt = rows(a0Df.unionByName(daDf).join(b0Df.unionByName(dbDf), "k"))
    assert(maintained === rebuilt)
    // duplicate keys cross-multiply identically on both paths
    assert(maintained.size === rebuilt.size)
  }

  test("empty key list is refused") {
    intercept[IllegalArgumentException] {
      IncrementalJoin.delta(aOld, dA, bOld, dB, Nil)
    }
  }
}
