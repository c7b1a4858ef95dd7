package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

/** Label-propagation contract (t75): hand-verified votes on a tiny
  * graph, noise-edge resistance on planted communities, isolated-node
  * self-vote, parallel-edge multiplicity, and partitioning invariance
  * (all-integer voting). The cross-engine half (DuckDB replaying the
  * full iteration) is the t75 oracle. */
class CommunitiesSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int) =
    Communities.labelPropagation(
        nodes.toDF("id"), edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two planted triangles joined by one bridge resolve to two communities") {
    // triangle {0,1,2}, triangle {10,11,12}, bridge 2-10
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (2L, 10L))
    val got = run(Seq(0L, 1L, 2L, 10L, 11L, 12L), edges, rounds = 4)
    assert(got(0L) === got(1L) && got(1L) === got(2L))
    assert(got(10L) === got(11L) && got(11L) === got(12L))
    assert(got(0L) !== got(10L), "the bridge must not merge the triangles")
  }

  test("round-1 votes match hand computation (mode + self, min-label ties)") {
    // star: hub 0, leaves 5, 6 — leaf votes {self, 0} tie -> min = 0
    val got = run(Seq(0L, 5L, 6L), Seq((5L, 0L), (6L, 0L)), rounds = 1)
    assert(got(5L) === 0L && got(6L) === 0L)
    // hub votes {0, 5, 6} all c=1 -> min = 0
    assert(got(0L) === 0L)
  }

  test("parallel edges vote with multiplicity") {
    // node 9's neighbors: 1 (twice), 0 (once) -> label 1 despite 0 < 1
    val got = run(Seq(0L, 1L, 9L), Seq((9L, 1L), (1L, 9L), (9L, 0L)), rounds = 1)
    assert(got(9L) === 1L, "double edge to 1 must outvote the single edge to 0")
  }

  test("isolated nodes keep their own label; partitioning never changes labels") {
    val nodes = (0L to 40L)
    val edges = nodes.filter(_ >= 5).map(v => v -> (v % 5)) ++
      Seq(7L -> 8L, 13L -> 14L) // a little intra-noise
    val a = run(nodes, edges, rounds = 3)
    val b = Communities.labelPropagation(
        nodes.toDF("id").repartition(7), edges.toDF("src", "dst").repartition(5), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "labels must be partitioning-invariant")
    val iso = run(Seq(1L, 2L, 99L), Seq((1L, 2L)), rounds = 2)
    assert(iso(99L) === 99L, "an isolated node keeps its own label")
  }
}
