package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** [[Dedup.mergeComponents]] — incremental connected-components
  * maintenance. The contract under test is FULL-RECOMPUTE EQUALITY:
  * merging an increment's pairs into the stored (id, rep) table must
  * produce exactly `connectedComponents(storedPairs ∪ newPairs)`,
  * including the hard cases — a new edge BRIDGING two stored clusters,
  * chains through multiple stored clusters, increments touching
  * previously-unclustered ids, and a pure no-op increment. */
class IncrementalComponentsSpec extends AnyFunSuite with SparkTestSupport {

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("id_a", "id_b")
  }

  private def labels(df: DataFrame): Map[Long, Long] = {
    val rows = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep"))
    val m = rows.toMap
    // row-identity means CARDINALITY too: a regression emitting an id
    // from both the updated and the fresh branch must not hide in the
    // Map collapse
    assert(rows.length == m.size,
      s"duplicate id rows in components output: ${rows.groupBy(_._1).filter(_._2.length > 1).keys.toSeq.sorted}")
    m
  }

  /** merged-vs-recomputed equality over stored ∪ new pairs. */
  private def assertEqualsRecompute(storedPairs: Seq[(Long, Long)],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val stored = Dedup.connectedComponents(pairsDf(storedPairs))
    val merged = labels(Dedup.mergeComponents(stored, pairsDf(newPairs)))
    val full = labels(Dedup.connectedComponents(pairsDf(storedPairs ++ newPairs)))
    assert(merged === full)
    merged
  }

  test("new edge bridges two stored clusters → one component, global-min rep") {
    // stored: {1,2,3} rep 1 and {10,11} rep 10; the increment's single
    // edge 3–11 must relabel EVERY member of the second cluster to 1
    val m = assertEqualsRecompute(
      storedPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      newPairs = Seq((3L, 11L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("chain through three stored clusters collapses to the global min") {
    // new doc 100 links clusters {5,6}, {20,21}, {40,41} into one
    assertEqualsRecompute(
      storedPairs = Seq((5L, 6L), (20L, 21L), (40L, 41L)),
      newPairs = Seq((100L, 6L), (100L, 21L), (100L, 41L)))
  }

  test("new docs pairing only each other form a fresh cluster; stored untouched") {
    val m = assertEqualsRecompute(
      storedPairs = Seq((1L, 2L)),
      newPairs = Seq((50L, 51L), (51L, 52L)))
    assert(m(50L) === 50L && m(52L) === 50L && m(1L) === 1L)
  }

  test("new doc attaching to an unclustered old id labels both") {
    // 7 was never in stored (no old-old pair); the increment links it
    assertEqualsRecompute(
      storedPairs = Seq((1L, 2L)),
      newPairs = Seq((7L, 30L)))
  }

  test("duplicate/reversed/self increment edges are harmless") {
    assertEqualsRecompute(
      storedPairs = Seq((1L, 2L), (10L, 11L)),
      newPairs = Seq((2L, 10L), (10L, 2L), (2L, 10L), (11L, 11L)))
  }

  test("increment edge inside one stored cluster is a no-op") {
    val stored = Dedup.connectedComponents(pairsDf(Seq((1L, 2L), (2L, 3L))))
    val merged = labels(Dedup.mergeComponents(stored, pairsDf(Seq((1L, 3L)))))
    assert(merged === labels(stored))
  }

  test("new node with a LOWER id than a stored rep becomes the new rep") {
    // stored {5,6} rep 5; new doc 2 joins → rep must drop to 2
    val m = assertEqualsRecompute(
      storedPairs = Seq((5L, 6L)),
      newPairs = Seq((2L, 6L)))
    assert(m === Map(5L -> 2L, 6L -> 2L, 2L -> 2L))
  }

  test("composition: folding pair batches one at a time equals one big merge") {
    // the daily-crawl claim: mergeComponents' OUTPUT satisfies its own
    // input precondition (star forest, min-id reps), so increments
    // fold associatively — day 2's merge starts from day 1's table
    val storedPairs = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val p1 = Seq((30L, 2L), (31L, 32L))          // new cluster + attach
    val p2 = Seq((31L, 11L), (10L, 20L))         // bridge via earlier-new + old-old pair
    val stored = Dedup.connectedComponents(pairsDf(storedPairs))
    val folded = labels(Dedup.mergeComponents(
      Dedup.mergeComponents(stored, pairsDf(p1)), pairsDf(p2)))
    val oneShot = labels(Dedup.mergeComponents(stored, pairsDf(p1 ++ p2)))
    val full = labels(Dedup.connectedComponents(pairsDf(storedPairs ++ p1 ++ p2)))
    assert(folded === full)
    assert(oneShot === full)
  }

  test("untouched stored clusters pass through with their rows intact") {
    val m = assertEqualsRecompute(
      storedPairs = Seq((1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L)),
      newPairs = Seq((10L, 30L)))
    assert(m(20L) === 20L && m(22L) === 20L && m(1L) === 1L)
    assert(m(30L) === 10L)
  }
}
