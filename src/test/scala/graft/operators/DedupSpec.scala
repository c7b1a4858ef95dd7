package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** DataFrame-level dedup pipeline: exact, MinHash-LSH block+verify,
  * SimHash, n-gram Jaccard. */
class DedupSpec extends AnyFunSuite with SparkTestSupport {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "The quick brown fox jumps over the lazy dog near the river bank today!"), // exact after normalize
      (3L, "The quick brown fox jumps over the lazy dog near the river bank yesterday"), // near-dup
      (4L, "Completely different content about quantum physics and machine learning models"),
      (5L, "hi"), // < 3 tokens → empty shingle set
      (6L, "ok"), // < 3 tokens
      (7L, "")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups normalized-identical docs, keeps min id") {
    val groups = Dedup.exact(docs, col("text"), col("doc_id"))
      .filter(col("dup_count") > 1).collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[Long]("keep_id") === 1L)
    assert(groups(0).getAs[Long]("dup_count") === 2L)
  }

  test("minHashSignatures: NULL signature for short docs, k-wide otherwise") {
    val sigs = Dedup.minHashSignatures(docs, col("text"), col("doc_id"), n = 3, k = 16)
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Seq[Long]]("minhash"))).toMap
    assert(sigs(1L).get.length === 16)
    assert(sigs(5L).isEmpty && sigs(6L).isEmpty && sigs(7L).isEmpty)
    assert(sigs(1L) === sigs(2L)) // normalization removes the "!"
  }

  test("minHashCandidatePairs finds near-dups, never pairs short docs (regression)") {
    val pairs = Dedup.minHashCandidatePairs(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    // the round-1 sentinel bug paired every short/empty doc; must be gone
    assert(!pairs.exists { case (a, b) => a >= 5L || b >= 5L })
  }

  test("minHashPairs estimates jaccard ≈ 1.0 for exact dup, filters by threshold") {
    val pairs = Dedup.minHashPairs(docs, col("text"), col("doc_id"), threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("est_jaccard")).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("simHashSignatures: equal for identical docs, close for near-dups") {
    val sigs = Dedup.simHashSignatures(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) < 12)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 12)
  }

  test("simHashPairs: pigeonhole finds every pair within hamming 3") {
    import spark.implicits._
    // near-identical long docs differ by a couple of tokens → tiny
    // hamming distance; unrelated docs are far
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, (100 to 160).map(i => s"zz$i").mkString(" "))
    ).toDF("doc_id", "text")
    val sigs = Dedup.simHashSignatures(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val pairs = Dedup.simHashPairs(d, col("text"), col("doc_id"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (h12 <= 3) assert(pairs === Set((1L, 2L))) // guaranteed by pigeonhole
    else assert(!pairs.contains((1L, 2L)))        // correctly filtered by verify
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("contamination flags corpus docs sharing eval 8-grams, zero for clean") {
    import spark.implicits._
    val evalDoc = "the quick brown fox jumps over the lazy dog tonight again"
    val corpus = Seq(
      // 1: embeds the eval doc verbatim → heavily contaminated
      (1L, s"some padding words here $evalDoc and trailing content too"),
      // 2: clean — no shared 8-gram
      (2L, "completely unrelated text about spark catalyst optimizer internals with many more words to form shingles"),
      // 3: too short for any 8-gram
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, evalSet, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_shingles"), r.getAs[Long]("n_shared"), r.getAs[Double]("contamination"))).toMap
    assert(out(1L)._2 === 4) // the eval doc's 11 tokens yield 4 8-grams, all embedded
    assert(out(1L)._3 > 0.2)
    assert(out(2L)._2 === 0L && out(2L)._3 === 0.0)
    assert(out(3L) === ((0, 0L, 0.0))) // shingle-less: present, zeroed, no div-by-0
  }

  test("contaminationReport: per-(eval item, doc) pairs with item-coverage fractions; clean pairs absent") {
    import spark.implicits._
    val g = "alpha beta gamma delta"                 // one shared 4-gram
    val corpus = Seq(
      (1L, s"intro words $g outro words"),           // shares g with eval 100
      (2L, s"$g padding and also epsilon zeta eta theta"), // shares g AND a second gram with 101
      (3L, "nothing in common with any benchmark at all")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, s"prefix $g suffix"),                   // 6 tokens → 3 distinct 4-grams
      (101L, s"$g epsilon zeta eta theta")           // 8 tokens → 5 distinct 4-grams
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, evalSet, col("text"), col("doc_id"), n = 4)
      .orderBy(col("eval_id"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // eval 100 shares only g with docs 1 and 2 → 1 of its 3 grams;
    // eval 101 shares g with doc 1 (1 of 5) and BOTH g and
    // "epsilon zeta eta theta" with doc 2 (2 of 5); doc 3 and all
    // clean pairs are absent
    assert(out === Seq(
      (100L, 1L, 1L, 0.3333), (100L, 2L, 1L, 0.3333),
      (101L, 1L, 1L, 0.2), (101L, 2L, 2L, 0.4)))
  }

  test("connectedComponents: chains collapse to one min-id cluster, diameter > 1 converges") {
    import spark.implicits._
    // two components: a 4-chain 10-11-12-13 (diameter 3 — needs >1
    // propagation round) and an isolated pair 20-21
    val pairs = Seq((11L, 10L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: diameter far beyond the old 25-round cap converges (large/small-star)") {
    import spark.implicits._
    // a 201-node chain (diameter 200 — the old min-label propagation
    // capped out at 25 rounds) plus a 100-member star and a lone pair
    val chain = (0 until 200).map(i => (i.toLong, i + 1L))
    val star = (1 to 100).map(i => (1000L, 1000L + i))
    val pairs = (chain ++ star ++ Seq((5000L, 4999L))).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 201 + 101 + 2)
    assert((0 to 200).forall(i => got(i.toLong) == 0L), "chain must collapse to min id 0")
    assert((0 to 100).forall(i => got(1000L + i) == 1000L))
    assert(got(4999L) === 4999L && got(5000L) === 4999L)
  }

  test("connectedComponents: bridged components merge to the global min") {
    import spark.implicits._
    // two stars joined by one bridge edge — labels must not stop at the
    // local centers
    val pairs = ((1 to 5).map(i => (10L, 10L + i)) ++
      (1 to 5).map(i => (50L, 50L + i)) ++ Seq((15L, 55L))).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(10L))
  }

  test("isStarForest: exactly the fixed points of the star contraction pass") {
    import spark.implicits._
    def sf(edges: Seq[(Long, Long)]): Boolean =
      Dedup.isStarForest(edges.toDF("src", "dst"))
    // low-rooted flat functional star forests → fixed points
    assert(sf(Seq((2L, 1L), (3L, 1L), (5L, 4L))))
    assert(sf(Seq((7L, 3L))))
    // violations, one per condition:
    assert(!sf(Seq((1L, 2L))), "backward edge (src < dst)")
    assert(!sf(Seq((2L, 2L))), "self edge")
    assert(!sf(Seq((3L, 1L), (3L, 2L))), "non-functional (two roots for one src)")
    assert(!sf(Seq((2L, 1L), (3L, 2L))), "non-flat (2 is both src and dst)")
    // and the claimed sufficiency: a star forest passes one full round
    // UNCHANGED (it really is a fixed point of smallStar ∘ largeStar)
    val star = Seq((2L, 1L), (3L, 1L), (5L, 4L)).toDF("src", "dst")
    val next = Dedup.smallStar(Dedup.largeStar(star))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(next === Set((2L, 1L), (3L, 1L), (5L, 4L)))
  }

  test("connectedComponents: an already-star input converges without a contraction round") {
    import spark.implicits._
    // the incremental-maintenance fast path: pairs that are already a
    // low-rooted star forest (plus a self-pair, which must NOT take the
    // fast path — its endpoint only surfaces via the nodes union)
    val pairs = Seq((20L, 1L), (30L, 1L), (9L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 20L -> 1L, 30L -> 1L, 9L -> 9L))
  }

  test("canonicalPerCluster: best score kept per cluster, ties to lowest id, singletons keep") {
    import spark.implicits._
    // cluster {1,2,3}: 2 has the best score → keep=2
    // cluster {10,11}: tied scores → keep = lowest id 10
    // 20: singleton → keeps itself
    val scored = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5),
      (10L, 0.7), (11L, 0.7), (20L, 0.1)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalPerCluster(scored, col("doc_id"), col("q"), pairs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got === Map(
      1L -> ((1L, 0.3, 0)), 2L -> ((1L, 0.9, 1)), 3L -> ((1L, 0.5, 0)),
      10L -> ((10L, 0.7, 1)), 11L -> ((10L, 0.7, 0)),
      20L -> ((20L, 0.1, 1))))
    // exactly one keeper per cluster
    val keepers = got.toSeq.filter(_._2._3 == 1).groupBy(_._2._1).view.mapValues(_.size)
    assert(keepers.toMap.values.forall(_ == 1))
  }

  test("incrementalNearDups: new batch matches the index, never new-new or old-old") {
    // existing corpus = odd ids, new batch = even ids; doc 2 is an
    // exact dup (post-normalize) of existing doc 1, doc 4 matches
    // nothing, docs 5-6 are short (no signature → never candidates)
    val existing = docs.filter(col("doc_id") % 2 === 1)
    val newBatch = docs.filter(col("doc_id") % 2 === 0)
    val index = Dedup.minHashIndex(existing, col("text"), col("doc_id"))
    val got = Dedup.incrementalNearDups(newBatch, col("text"), col("doc_id"), index)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"), r.getAs[Double]("est_jaccard")))
    // doc 2 == doc 1 exactly → every signature lane agrees
    assert(got.exists { case (n, o, j) => n == 2L && o == 1L && j == 1.0 })
    // every emitted pair is new-vs-existing, nothing else
    assert(got.forall { case (n, o, _) => n % 2 == 0 && o % 2 == 1 })
    // near-dup doc 3 is on the EXISTING side of this split; it may only
    // appear as dup_of, and 4 (unrelated) never appears
    assert(!got.exists(_._1 == 4L))
  }

  test("indexWithoutDeleted: serving minus a takedown equals a rebuild from survivors") {
    val existing = docs.filter(col("doc_id") % 2 === 1)
    val newBatch = docs.filter(col("doc_id") % 2 === 0)
    val index = Dedup.minHashIndex(existing, col("text"), col("doc_id"))
    // delete doc 1 — the exact-dup anchor doc 2 matched in the test
    // above; the match must disappear, and the served view must be
    // row-identical to an index rebuilt without doc 1
    val deleted = docs.filter(col("doc_id") === 1).select(col("doc_id").as("id"))
    def rows(idx: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNearDups(newBatch, col("text"), col("doc_id"), idx)
        .collect()
        .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"), r.getAs[Double]("est_jaccard")))
        .toSet
    val served = rows(Dedup.indexWithoutDeleted(index, deleted))
    val rebuilt = rows(Dedup.minHashIndex(
      existing.filter(col("doc_id") =!= 1), col("text"), col("doc_id")))
    assert(served === rebuilt)
    assert(!served.exists(_._2 == 1L), "a deleted doc must never resurface as dup_of")
    // the parameter stamp survives the anti join — mismatched requests
    // still fail fast against the served view
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(newBatch, col("text"), col("doc_id"),
        Dedup.indexWithoutDeleted(index, deleted), k = 32)
    }
  }

  test("incrementalNearDups: index built under different banding fails fast, even via parquet") {
    val existing = docs.filter(col("doc_id") % 2 === 1)
    val newBatch = docs.filter(col("doc_id") % 2 === 0)
    val index = Dedup.minHashIndex(existing, col("text"), col("doc_id"), n = 3, k = 16, rowsPerBand = 4)
    // the stamp must survive the parquet round-trip — that's the whole
    // point of versioning the index FILE, not the in-memory frame
    val dir = java.nio.file.Files.createTempDirectory("mh-index").resolve("idx").toString
    index.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    for ((n2, k2, rpb2) <- Seq((4, 16, 4), (3, 32, 4), (3, 16, 2))) {
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDups(newBatch, col("text"), col("doc_id"), stored,
          n = n2, k = k2, rowsPerBand = rpb2)
      }
      assert(e.getMessage.contains("rebuild the index"))
    }
    // matching parameters still work against the stored index
    assert(Dedup.incrementalNearDups(newBatch, col("text"), col("doc_id"), stored)
      .collect().exists(r => r.getAs[Long]("new_id") == 2L))
  }

  test("minHashIndex: one banded row per (doc, band); short docs absent") {
    val idx = Dedup.minHashIndex(docs, col("text"), col("doc_id")).collect()
    val byId = idx.groupBy(_.getAs[Long]("id"))
    // 16 lanes / 4 rows per band = 4 bands per signed doc
    assert(byId.keySet === Set(1L, 2L, 3L, 4L))
    assert(byId.values.forall(_.map(_.getAs[Int]("band")).sorted.toSeq == Seq(0, 1, 2, 3)))
  }

  test("ngramJaccard column: 1.0 for normalized-equal, 0.0 for empty") {
    import spark.implicits._
    val out = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.ngramJaccard(col("a.text"), col("b.text")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((5L, 6L)) === 0.0) // both empty shingle sets
    assert(out((1L, 7L)) === 0.0)
    assert(out((1L, 3L)) > 0.5 && out((1L, 3L)) < 1.0)
    assert(out((1L, 4L)) < 0.1)
  }

  test("leakageSafeSplit: cluster members co-assign; assignment is deterministic") {
    val out = Dedup.leakageSafeSplit(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cluster"), r.getAs[String]("split")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)) // every doc assigned
    // docs 1/2/3 are one near-dup family → one cluster, one split
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size === 1)
    // singletons cluster as themselves
    assert(out(4L)._1 === 4L && out(5L)._1 === 5L && out(7L)._1 === 7L)
    assert(out.values.forall(v => Set("train", "val", "test").contains(v._2)))
    // determinism: a second run gives the identical assignment
    val again = Dedup.leakageSafeSplit(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cluster"), r.getAs[String]("split")))).toMap
    assert(again === out)
  }

  test("components reuse: one clustering feeds canonical selection AND the split identically") {
    import spark.implicits._
    // the production shape: compute connectedComponents ONCE, hand the
    // (id, rep) frame to every consumer — answers must equal the
    // end-to-end operators that cluster internally
    val scored = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5),
      (10L, 0.7), (11L, 0.7), (20L, 0.1)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
    val viaComp = Dedup.canonicalPerClusterOnComponents(
        scored, col("doc_id"), col("q"), comp)
      .orderBy(col("id")).collect().toSeq
    val endToEnd = Dedup.canonicalPerCluster(scored, col("doc_id"), col("q"), pairs)
      .orderBy(col("id")).collect().toSeq
    assert(viaComp === endToEnd)
    val splitPairs = Dedup.minHashPairsVerified(docs, col("text"), col("doc_id"),
      threshold = 0.5)
    val splitComp = Dedup.connectedComponents(splitPairs.select(col("id_a"), col("id_b")))
    val splitViaComp = Dedup.leakageSafeSplitOnComponents(docs, col("doc_id"), splitComp)
      .orderBy(col("id")).collect().toSeq
    val splitEndToEnd = Dedup.leakageSafeSplit(docs, col("text"), col("doc_id"))
      .orderBy(col("id")).collect().toSeq
    assert(splitViaComp === splitEndToEnd)
  }

  test("passageDedup: corpus-wide first occurrence wins, docs reassemble in order") {
    import spark.implicits._
    // 4-token passages; shared passage "a b c d" appears in docs 1 (idx 0),
    // 2 (idx 0), and twice inside doc 3 (idx 0 and 1).
    val pd = Seq(
      (1L, "a b c d e f g h"),            // passages: "a b c d" | "e f g h"
      (2L, "a b c d x y z w"),            // "a b c d" (dup) | "x y z w"
      (3L, "a b c d a b c d"),            // both passages dup (intra + inter)
      (4L, "p q r")                       // single short passage, unique
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(pd, col("text"), col("doc_id"), passageTokens = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_passages"), r.getAs[Int]("n_kept"), r.getAs[String]("clean"))))
      .toMap
    assert(out(1L) === ((2, 2, "a b c d e f g h")))   // first occurrence keeps all
    assert(out(2L) === ((2, 1, "x y z w")))           // shared head removed
    assert(out(3L) === ((2, 0, "")))                  // everything seen at doc 1
    assert(out(4L) === ((1, 1, "p q r")))             // trailing partial passage survives
  }

  test("passageDedup: empty text yields one empty passage, first empty doc keeps it") {
    import spark.implicits._
    val pd = Seq((10L, ""), (11L, ""), (12L, "solo unique words here")).toDF("doc_id", "text")
    val out = Dedup.passageDedup(pd, col("text"), col("doc_id"), passageTokens = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_passages"), r.getAs[Int]("n_kept")))).toMap
    assert(out(10L) === ((1, 1)))
    assert(out(11L) === ((1, 0)))
    assert(out(12L) === ((1, 1)))
  }
}
