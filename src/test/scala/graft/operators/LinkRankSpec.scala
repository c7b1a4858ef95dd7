package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport

/** PageRank contract on hand-computable graphs: mass conservation
  * (dangling redistribution — dropping it would leak rank), symmetry,
  * a hand-checked hub, determinism across partitionings (the
  * quantized-sum claim), and isolated-node behavior. The cross-engine
  * half (DuckDB replaying the full iteration) is the t66 oracle. */
class LinkRankSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int = 8) =
    LinkRank.pagerank(
      nodes.toDF("id"), edges.toDF("src", "dst"), rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("rank mass is conserved (sums to 1) even with dangling nodes") {
    // 3 is dangling (only inbound); 4 is isolated (no edges at all)
    val ranks = run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"mass leaked: ${ranks.values.sum}")
  }

  test("a symmetric cycle ranks uniformly; a hub out-ranks its spokes") {
    val cycle = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(cycle.values.toSeq.distinct.size === 1, s"cycle must be uniform: $cycle")
    assert(math.abs(cycle(1L) - 1.0 / 3) < 1e-9)
    // spokes all point at the hub
    val hub = run(Seq(1L, 2L, 3L, 4L), Seq((2L, 1L), (3L, 1L), (4L, 1L)))
    assert(hub(1L) > hub(2L) * 2, s"hub must dominate: $hub")
    assert(hub(2L) === hub(3L))
    assert(hub(3L) === hub(4L))
  }

  test("deterministic across partitionings (quantized integer sums)") {
    val nodes = (0L to 60L).toSeq
    val edges = nodes.flatMap(i => Seq(i -> (i * 7 + 1) % 61, i -> (i * 11 + 3) % 61))
      .filter(_._1 % 9 != 0) // some dangling
    val a = LinkRank.pagerank(nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = LinkRank.pagerank(nodes.toDF("id").repartition(7),
        edges.toDF("src", "dst").repartition(5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b, "ranks must be bit-identical under any partitioning")
  }

  test("continueFrom: dangling mass intact through the stored-table boundary (memorylessness)") {
    import spark.implicits._
    // node 3 dangling (only inbound), node 4 isolated — the
    // continuation path must re-derive BOTH flags when attaching them
    // to the stored rank vector (the round-14 dang-flag init join)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val stored = LinkRank.pagerank(nodes, edges, rounds = 3)
    val cont = LinkRank.continueFrom(nodes, edges, stored, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(cont.values.sum - 1.0) < 1e-6, s"mass leaked: $cont")
    // memorylessness: 3 rounds + (grid floor) + 2 rounds ≈ 5 straight
    // rounds — the boundary floor perturbs each rank by ≤ 1e-9/round
    val straight = LinkRank.pagerank(nodes, edges, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, r) <- straight)
      assert(math.abs(cont(id) - r) < 1e-6, s"node $id: ${cont(id)} vs $r")
  }

  test("all-dangling graph degenerates to uniform; empty node set refuses") {
    val ranks = run(Seq(1L, 2L), Seq.empty)
    assert(ranks(1L) === ranks(2L))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    intercept[IllegalArgumentException] {
      LinkRank.pagerank(Seq.empty[Long].toDF("id"),
        Seq.empty[(Long, Long)].toDF("src", "dst"), rounds = 0)
    }
  }
}
