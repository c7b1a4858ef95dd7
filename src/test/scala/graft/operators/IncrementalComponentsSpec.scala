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

  // ---- removeFromComponents: the delete-aware inverse ----------------

  private def idsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** delete-vs-recompute equality: removing `deleted` from the stored
    * clustering of `pairs` must equal clustering the surviving induced
    * subgraph from scratch. */
  private def assertDeleteEqualsRecompute(pairs: Seq[(Long, Long)],
      deleted: Seq[Long]): Map[Long, Long] = {
    val stored = Dedup.connectedComponents(pairsDf(pairs))
    val removed = labels(
      Dedup.removeFromComponents(stored, idsDf(deleted), pairsDf(pairs)))
    val del = deleted.toSet
    val survivingPairs = pairs.filter(p => !del(p._1) && !del(p._2))
    val full = labels(Dedup.connectedComponents(pairsDf(survivingPairs)))
    assert(removed === full)
    removed
  }

  test("deleting a bridge doc SPLITS its component — the case min-label merge cannot express") {
    // path 1–2–3–4–5; doc 3 is the only bridge. Deleting it must yield
    // {1,2} rep 1 and {4,5} rep 4 — a stale min-label table would keep
    // all four survivors under rep 1 (the over-clustering the verdict
    // flagged for every stored-components consumer)
    val m = assertDeleteEqualsRecompute(
      pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      deleted = Seq(3L))
    assert(m === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("deleting the rep (min id) promotes the next-smallest survivor") {
    val m = assertDeleteEqualsRecompute(
      pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      deleted = Seq(1L))
    assert(m === Map(2L -> 2L, 3L -> 2L))
  }

  test("a survivor whose only partner was deleted drops out, as a rebuild would drop it") {
    // {1,2}: delete 1 → 2 appears in no surviving pair → no row
    val m = assertDeleteEqualsRecompute(
      pairs = Seq((1L, 2L), (10L, 11L)),
      deleted = Seq(1L))
    assert(m === Map(10L -> 10L, 11L -> 10L))
  }

  test("components without a deleted member pass through untouched; unknown ids are no-ops") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    val m = assertDeleteEqualsRecompute(pairs, deleted = Seq(11L, 999L))
    assert(m(1L) === 1L && m(3L) === 1L && m(20L) === 20L && m(22L) === 20L)
    assert(!m.contains(11L) && !m.contains(10L), "10's only partner was deleted")
    // empty delete batch: byte-for-byte identity
    val stored = Dedup.connectedComponents(pairsDf(pairs))
    assert(labels(Dedup.removeFromComponents(stored, idsDf(Nil), pairsDf(pairs)))
      === labels(stored))
  }

  test("delete that keeps the component connected only relabels if the rep died") {
    // triangle 1–2–3 plus pendant 4 on 2: deleting 4 keeps {1,2,3}
    // intact under rep 1 (no relabel at all)
    val m = assertDeleteEqualsRecompute(
      pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L)),
      deleted = Seq(4L))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("deletes and merges fold in any order (output satisfies both preconditions)") {
    val day0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val day1New = Seq((20L, 21L), (21L, 4L))
    val deleted = Seq(3L)
    val stored = Dedup.connectedComponents(pairsDf(day0))
    // merge day-1 pairs, THEN delete doc 3
    val mergeFirst = labels(Dedup.removeFromComponents(
      Dedup.mergeComponents(stored, pairsDf(day1New)),
      idsDf(deleted), pairsDf(day0 ++ day1New)))
    // delete doc 3, THEN merge day-1 pairs (none of which touch 3)
    val deleteFirst = labels(Dedup.mergeComponents(
      Dedup.removeFromComponents(stored, idsDf(deleted), pairsDf(day0)),
      pairsDf(day1New)))
    val del = deleted.toSet
    val survivors = (day0 ++ day1New).filter(p => !del(p._1) && !del(p._2))
    val full = labels(Dedup.connectedComponents(pairsDf(survivors)))
    assert(mergeFirst === full)
    assert(deleteFirst === full)
  }

  // ---- randomized model fuzz (seeded — deterministic across runs) ----

  /** Independent driver-side twin: union-find with min-id roots over
    * the pair list; docs in no pair have no row. A DIFFERENT algorithm
    * from both the star contraction and the DuckDB closure — agreement
    * is evidence, not self-confirmation. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("fuzz: random pair sets, random slicings — folded merges equal the union-find model") {
    // the associativity claim carrying the whole t40/s20 family,
    // checked over random graphs instead of two hand-picked cases
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 4) {
      val n = 8 + rnd.nextInt(18)
      def pair() = ((1 + rnd.nextInt(n)).toLong, (1 + rnd.nextInt(n)).toLong)
      val storedPairs = Seq.fill(3 + rnd.nextInt(8))(pair())
      val newPairs = Seq.fill(2 + rnd.nextInt(10))(pair())
      val slices = {
        val k = 1 + rnd.nextInt(3)
        newPairs.zipWithIndex.groupMap(_._2 % k)(_._1).values.toSeq
      }
      val stored = Dedup.connectedComponents(pairsDf(storedPairs))
      val folded = slices.foldLeft(stored)((acc, s) =>
        Dedup.mergeComponents(acc, pairsDf(s)))
      val expected = unionFind(storedPairs ++ newPairs)
      assert(labels(folded) === expected,
        s"trial $trial: stored=$storedPairs slices=$slices")
    }
  }

  test("fuzz: random deletes over random graphs equal the union-find model on survivors") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 4) {
      val n = 8 + rnd.nextInt(18)
      def pair() = ((1 + rnd.nextInt(n)).toLong, (1 + rnd.nextInt(n)).toLong)
      val pairs = Seq.fill(5 + rnd.nextInt(14))(pair())
      val deleted = (1 to 1 + rnd.nextInt(4)).map(_ => (1 + rnd.nextInt(n)).toLong).distinct
      val del = deleted.toSet
      val stored = Dedup.connectedComponents(pairsDf(pairs))
      val removed = labels(
        Dedup.removeFromComponents(stored, idsDf(deleted), pairsDf(pairs)))
      val expected = unionFind(pairs.filter(p => !del(p._1) && !del(p._2)))
        .filter { case (id, _) => !del(id) }
      assert(removed === expected, s"trial $trial: pairs=$pairs deleted=$deleted")
      // slicing invariance (the s21 streamed-fold claim): the same
      // delete set in 1..3 ordered batches against the SAME immutable
      // pair log lands on the same table
      val k = 1 + rnd.nextInt(3)
      val slices = deleted.zipWithIndex.groupMap(_._2 % k)(_._1).values.toSeq
      val folded = labels(slices.foldLeft(stored)((st, sl) =>
        Dedup.removeFromComponents(st, idsDf(sl), pairsDf(pairs))))
      assert(folded === expected, s"trial $trial sliced: slices=$slices")
    }
  }
}
