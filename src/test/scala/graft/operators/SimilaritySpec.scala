package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Embedding similarity search: brute-force kNN oracle, LSH bucketing,
  * and the near-dup pair pipeline. */
class SimilaritySpec extends AnyFunSuite with SparkTestSupport {

  // 2-D embeddings on the unit circle at known angles: cosine to a query
  // along angle 0 is just cos(angle) — exact expected ranking.
  private lazy val embs = {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.0), (2L, 0.1), (3L, 0.5), (4L, 1.2),
      (5L, 2.0), (6L, 2.8), (7L, math.Pi)
    ).map { case (id, ang) => (id, Array(math.cos(ang).toFloat, math.sin(ang).toFloat)) }
    rows.toDF("id", "emb")
  }

  private val query = Array(1.0, 0.0)

  test("bruteForceKnn ranks by exact cosine, descending") {
    val top3 = Similarity.bruteForceKnn(embs, col("emb"), col("id"), query, 3)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(top3 === Seq(1L, 2L, 3L))
  }

  test("bruteForceKnn scores match cos(angle) to 4dp") {
    val scores = Similarity.bruteForceKnn(embs, col("emb"), col("id"), query, 7)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(math.abs(scores(1L) - 1.0) < 1e-3)
    assert(math.abs(scores(7L) - (-1.0)) < 1e-3)
    assert(math.abs(scores(3L) - math.cos(0.5)) < 1e-3)
  }

  test("maxSimKnn: hand-computed MaxSim; token-level match beats pooled cosine") {
    import spark.implicits._
    // 4-dim docs = two 2-dim tokens. Query tokens: (1,0) and (0,1).
    // doc 1 has an exact match for EACH query token (maxsim = 2.0);
    // doc 2's tokens both sit at 45° (maxsim = 2·cos45 ≈ 1.4142);
    // doc 3 matches query token 1 twice, never token 2 (maxsim ≈ 1.0).
    val docs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 1.0)),
      (2L, Seq(1.0, 1.0, 1.0, 1.0)),
      (3L, Seq(1.0, 0.0, 2.0, 0.0)))
      .toDF("id", "v")
    val q = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Similarity.maxSimKnn(docs, col("v"), col("id"), q, tokenDim = 2, k = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("maxsim")).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got(0)._2 === 2.0)
    assert(got(1)._2 === 1.4142)
    assert(got(2)._2 === 1.0)
    // single pooled cosine can NOT separate docs 1 and 2 this way:
    // pooled cos(doc1, (1,0,0,1)-ish query) ranks doc 2 equal or above
    // — the token-level interaction is the point of the operator
  }

  test("maxSimRerank with a full shortlist equals brute maxSimKnn") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 1.0)), (2L, Seq(1.0, 1.0, 1.0, 1.0)),
      (3L, Seq(1.0, 0.0, 2.0, 0.0)), (4L, Seq(-1.0, 0.5, 0.3, -2.0)))
      .toDF("id", "v")
    val q = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val brute = Similarity.maxSimKnn(docs, col("v"), col("id"), q, 2, k = 4).collect()
    val rerank = Similarity.maxSimRerank(docs, col("v"), col("id"),
      docs.select(col("id")), q, 2, k = 4).collect()
    assert(brute.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      rerank.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // and a partial shortlist restricts the candidate set, not the scoring
    val part = Similarity.maxSimRerank(docs, col("v"), col("id"),
      Seq(2L, 4L).toDF("id"), q, 2, k = 4).collect()
    assert(part.map(_.getLong(0)).toSet === Set(2L, 4L))
  }

  test("lshBuckets is deterministic and groups nearby vectors") {
    val b1 = Similarity.lshBuckets(embs, col("emb"), col("id"), nBits = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    val b2 = Similarity.lshBuckets(embs, col("emb"), col("id"), nBits = 4, dim = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert(b1 === b2) // probed dim == passed dim
    assert(b1(1L) === b1(2L)) // 0.1 rad apart → same halfspaces at 4 bits (seeded)
  }

  test("lshBuckets on empty input raises a meaningful error") {
    val empty = embs.filter(col("id") > 100L)
    val e = intercept[IllegalArgumentException] {
      Similarity.lshBuckets(empty, col("emb"), col("id"))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("lshKnn multiprobe returns exactly k rows, correctly ranked") {
    val lsh = Similarity.lshKnn(embs, col("emb"), col("id"), query, k = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score"))
    // multiprobe escalates the hamming radius until >= k candidates, so
    // a 7-row corpus must yield exactly 5, ranked by exact cosine
    assert(lsh.length === 5)
    assert(lsh.map(_._2).toSeq === lsh.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    assert(lsh.map(_._1).contains(1L)) // the query's own direction must bucket with it
  }

  test("lshKnnOnIndex over a persisted bucket table equals the one-shot path") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-index").toString + "/idx"
    Similarity.lshBuckets(embs, col("emb"), col("id"), nBits = 4, dim = 2)
      .write.parquet(dir)
    val index = spark.read.parquet(dir)
    val served = Similarity.lshKnnOnIndex(index, query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val oneShot = Similarity.lshKnn(embs, col("emb"), col("id"), query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(served === oneShot)
  }

  test("lshKnnOnIndex: incrementally-appended index == full rebuild (append-only maintenance)") {
    // build on the first half, append the second half's index rows —
    // signatures are row-local (own embedding × fixed planes), so the
    // appended index must serve row-identically to a full rebuild
    val dir = java.nio.file.Files.createTempDirectory("lsh-index-inc").toString + "/idx"
    Similarity.lshBuckets(embs.filter(col("id") <= 4), col("emb"), col("id"),
        nBits = 4, dim = 2)
      .write.parquet(dir)
    Similarity.lshBuckets(embs.filter(col("id") > 4), col("emb"), col("id"),
        nBits = 4, dim = 2)
      .write.mode("append").parquet(dir)
    val appended = Similarity.lshKnnOnIndex(spark.read.parquet(dir), query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val rebuilt = Similarity.lshKnn(embs, col("emb"), col("id"), query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(appended === rebuilt)
  }

  test("lshLive: tombstoned index == rebuild-without-deleted (single + batch); compaction clears markers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lsh-del-spec").toString + "/idx"
    Similarity.lshBuckets(embs, col("emb"), col("id"), nBits = 4, dim = 2)
      .write.partitionBy("bucket").parquet(dir)
    // deleting an absent id is a no-op
    assert(Similarity.lshTombstones(spark.read.parquet(dir),
      Seq(999L).toDF("id"), col("id")).count() === 0)
    val deleted = Seq(2L, 5L)
    Similarity.lshTombstones(spark.read.parquet(dir), deleted.toDF("id"), col("id"))
      .write.mode("append").partitionBy("bucket").parquet(dir)
    val survivors = embs.filter(!col("id").isin(deleted: _*))
    // single-query serving: live view == one-shot over survivors —
    // the radius histogram must shrink WITH the corpus (a tombstone's
    // non-null bucket counting as occupancy would break this)
    val served = Similarity.lshKnnOnIndex(
        Similarity.lshLive(spark.read.parquet(dir)), query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val rebuilt = Similarity.lshKnn(survivors, col("emb"), col("id"), query, k = 5, nBits = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(served === rebuilt)
    assert(served.forall(r => !deleted.contains(r._1)))
    // batch serving over the live view matches per-query single serving
    val queries = embs.filter(col("id").isin(1L, 4L))
    val batch = Similarity.lshKnnBatch(Similarity.lshLive(spark.read.parquet(dir)),
        queries, col("emb"), col("id"), dim = 2, k = 3, nBits = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    assert(batch.forall(r => !deleted.contains(r._2)))
    // compaction: only live rows of affected buckets remain; the full
    // live row set equals a rebuild without the deleted vectors
    Similarity.lshCompact(spark.read.parquet(dir))
      .localCheckpoint(true)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(dir)
    val compacted = spark.read.parquet(dir)
    assert(compacted.filter(col("emb").isNull).count() === 0, "markers must clear")
    val wantIds = survivors.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(compacted.select(col("id")).collect().map(_.getLong(0)).toSet === wantIds)
    graft.streaming.StreamingRelational.deleteRecursively(
      java.nio.file.Paths.get(dir).getParent)
  }

  test("lshKnnBatch: every query's rows equal its single-query lshKnnOnIndex answer") {
    import spark.implicits._
    // richer corpus so per-query radii actually differ
    val rows = (0 until 40).map { i =>
      val ang = i * 0.157
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }
    val corpus = rows.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 2)
    val queries = corpus.filter(col("id").isin(0L, 7L, 23L))
    val batch = Similarity.lshKnnBatch(index, queries, col("emb"), col("id"),
        dim = 2, k = 5, nBits = 4)
      .collect()
      .map(r => (r.getAs[Long]("qid"), (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("rk"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
    for (qid <- Seq(0L, 7L, 23L)) {
      val qv = rows(qid.toInt)._2.map(_.toDouble)
      val single = Similarity.lshKnnOnIndex(index, qv, k = 5, nBits = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (r.getAs[Long]("id"), r.getAs[Double]("score"), i + 1) }.toSeq
      assert(batch(qid) === single, s"query $qid")
    }
  }

  test("lshKnnBatch: randomized parity with the single-query path (20 queries, seeded)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 5, dim = 8)
      .persist()
    try {
      val qids = rng.shuffle((0 until 300).toList).take(20).map(_.toLong)
      val batch = Similarity.lshKnnBatch(index, corpus.filter(col("id").isin(qids: _*)),
          col("emb"), col("id"), dim = 8, k = 7, nBits = 5)
        .collect()
        .map(r => (r.getAs[Long]("qid"), (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("rk"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
      assert(batch.keySet === qids.toSet)
      for (qid <- qids) {
        val qv = rows(qid.toInt)._2.map(_.toDouble)
        val single = Similarity.lshKnnOnIndex(index, qv, k = 7, nBits = 5)
          .collect().zipWithIndex
          .map { case (r, i) => (r.getAs[Long]("id"), r.getAs[Double]("score"), i + 1) }.toSeq
        assert(batch(qid) === single, s"query $qid")
      }
    } finally index.unpersist()
  }

  test("maxSimRerankBatch: every query's rows equal its sequential maxSimRerank answer") {
    import spark.implicits._
    // 4-dim embeddings = two 2-dim tokens; enough corpus that per-query
    // shortlists and radii differ
    val rng = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 4)
      .persist()
    try {
      val qids = Seq(0L, 13L, 41L)
      val queries = corpus.filter(col("id").isin(qids: _*))
      val shortlist = Similarity.lshKnnBatch(index, queries, col("emb"), col("id"),
        dim = 4, k = 12, nBits = 4)
      val batch = Similarity.maxSimRerankBatch(corpus, col("emb"), col("id"),
          shortlist.select(col("qid"), col("id")), queries, col("emb"), col("id"),
          tokenDim = 2, k = 5)
        .collect()
        .map(r => (r.getAs[Long]("qid"),
          (r.getAs[Long]("id"), r.getAs[Double]("maxsim"), r.getAs[Int]("rk"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
      assert(batch.keySet === qids.toSet)
      for (qid <- qids) {
        val qv = rows(qid.toInt)._2.map(_.toDouble)
        val singleShort = Similarity.lshKnnOnIndex(index, qv, k = 12, nBits = 4)
        val single = Similarity.maxSimRerank(corpus, col("emb"), col("id"),
            singleShort.select(col("id")), qv.grouped(2).toArray, tokenDim = 2, k = 5)
          .collect().zipWithIndex
          .map { case (r, i) => (r.getAs[Long]("id"), r.getAs[Double]("maxsim"), i + 1) }.toSeq
        assert(batch(qid) === single, s"query $qid")
      }
    } finally index.unpersist()
  }

  test("lshRadiusBatch: exactly the probed-bucket rows at or above the threshold") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val ang = i * 0.157
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }
    val corpus = rows.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 2)
    val buckets = index.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qids = Seq(0L, 7L, 23L)
    val got = Similarity.lshRadiusBatch(index, corpus.filter(col("id").isin(qids: _*)),
        col("emb"), col("id"), dim = 2, threshold = 0.5, nBits = 4, maxHamming = 1)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")) -> r.getAs[Double]("score"))
      .toMap
    val expected = (for {
      q <- qids
      (id, b) <- buckets
      if java.lang.Long.bitCount(b ^ buckets(q)) <= 1
      s = BigDecimal(cos(vecs(q), vecs(id))).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= 0.5
    } yield (q, id) -> s).toMap
    assert(got.keySet === expected.keySet)
    for ((k, s) <- expected)
      assert(math.abs(got(k) - s) < 2e-4, s"score drift at $k") // rounding-boundary slack
    // each query matches itself at 1.0
    for (q <- qids) assert(got((q, q)) === 1.0)
  }

  test("lshRadiusBatch: maxHamming = nBits is exact full-corpus radius search") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val ang = i * 0.157
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }
    val corpus = rows.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 2)
    val got = Similarity.lshRadiusBatch(index, corpus.filter(col("id") === 0L),
        col("emb"), col("id"), dim = 2, threshold = 0.8, nBits = 4, maxHamming = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    // cos(i*0.157) >= 0.8 ⇔ angle <= ~0.6435 ⇒ ids 0..4 (and the
    // near-2π tail 36..39 wraps back under the angle bound)
    val expected = rows.collect {
      case (id, v) if v(0) >= 0.8 - 1e-12 => id
    }.toSet
    assert(got === expected)
    assert(got.contains(0L) && got.size >= 5)
  }

  test("lshRadiusBatch: duplicate qids collapse, null-embedding queries drop") {
    import spark.implicits._
    val corpus = (0 until 20).map { i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 2)
    val queries = Seq(
      (100L, Array(1.0f, 0.0f)), (100L, Array(1.0f, 0.0f)),
      (101L, null: Array[Float])
    ).toDF("qid", "emb")
    val got = Similarity.lshRadiusBatch(index, queries, col("emb"), col("qid"),
        dim = 2, threshold = 0.9, nBits = 4, maxHamming = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")))
    assert(got.map(_._1).toSet === Set(100L))
    // duplicate qid contributes ONCE: ids are unique per query
    assert(got.length === got.distinct.length)
    assert(got.map(_._2).toSet === Set(0L, 1L)) // cos(0)=1, cos(0.3)≈0.955
  }

  test("lshKnnBatch: null-embedding query yields no rows, others unaffected") {
    import spark.implicits._
    val corpus = (0 until 20).map { i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }.toDF("id", "emb")
    val index = Similarity.lshBuckets(corpus, col("emb"), col("id"), nBits = 4, dim = 2)
    val queries = Seq(
      (100L, Array(1.0f, 0.0f)), (101L, null: Array[Float])
    ).toDF("qid", "emb")
    val got = Similarity.lshKnnBatch(index, queries, col("emb"), col("qid"),
        dim = 2, k = 3, nBits = 4)
      .collect().map(_.getAs[Long]("qid"))
    assert(got.toSet === Set(100L) && got.length === 3)
  }

  test("lshKnn ignores null-embedding rows instead of crashing the histogram") {
    import spark.implicits._
    val withNull = embs.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("id", "emb"))
    val lsh = Similarity.lshKnn(withNull, col("emb"), col("id"), query, k = 5)
      .collect().map(_.getAs[Long]("id"))
    assert(lsh.length === 5)
    assert(!lsh.contains(99L))
  }

  test("lshKnn with k > corpus size degrades to brute force over all rows") {
    val lsh = Similarity.lshKnn(embs, col("emb"), col("id"), query, k = 20)
      .collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceKnn(embs, col("emb"), col("id"), query, 20)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(lsh === brute) // radius escalates to nBits => every bucket probed
  }

  test("ivfIndex assigns each vector to its nearest centroid list") {
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val lists = Similarity.ivfIndex(embs, col("emb"), col("id"), cents)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("list")).toMap
    // angles < π/2 → centroid 0; angles > π/2 → centroid 1
    assert(lists(1L) === 0 && lists(2L) === 0 && lists(3L) === 0 && lists(4L) === 0)
    assert(lists(5L) === 1 && lists(6L) === 1 && lists(7L) === 1)
  }

  test("ivfKnn with all lists probed equals brute force; 1 probe stays in-list") {
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val brute = Similarity.bruteForceKnn(embs, col("emb"), col("id"), query, 4)
      .collect().map(_.getAs[Long]("id")).toSeq
    val full = Similarity.ivfKnn(embs, col("emb"), col("id"), cents, query, 4, nProbe = 2)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(full === brute)
    val oneProbe = Similarity.ivfKnn(embs, col("emb"), col("id"), cents, query, 4, nProbe = 1)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(oneProbe === Seq(1L, 2L, 3L, 4L)) // exactly list 0, ranked
  }

  test("cosineNearDupPairs finds close pairs above threshold, none across") {
    val pairs = Similarity.cosineNearDupPairs(embs, col("emb"), col("id"), threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // cos(0.1) ≈ 0.995
    assert(!pairs.exists { case (a, b) => a == 1L && b == 7L }) // antipodal
  }

  test("knnJoin: every id ranks its own bucket-mates, rk dense from 1") {
    // wide-open blocking (1 bit × 1 band puts halves of the circle in
    // two buckets) so the per-id candidate lists are known
    val knn = Similarity.knnJoin(embs, col("emb"), col("id"), k = 2,
        nBits = 1, nBands = 1)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("nbr"),
        r.getAs[Double]("score"), r.getAs[Int]("rk")))
    val byId = knn.groupBy(_._1)
    // each id's neighbors are ranked best-first with dense rk
    for ((_, rows) <- byId) {
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq)
      assert(rows.forall(r => r._2 != r._1), "no self-pairs")
    }
    // candidates are DIRECTED: 1's best neighbor is 2 AND 2's is 1
    assert(byId(1L).minBy(_._4)._2 === 2L)
    assert(byId(2L).minBy(_._4)._2 === 1L)
  }

  test("knnJoin: isolated bucket yields fewer than k rows, never cross-bucket") {
    // 4 bits at seed 42 split this corpus; an id alone in its buckets
    // for BOTH bands gets no rows at all — blocked recall, not a crash
    val knn = Similarity.knnJoin(embs, col("emb"), col("id"), k = 3,
        nBits = 4, nBands = 1)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("nbr"))).toSet
    val buckets = Similarity.lshBuckets(embs, col("emb"), col("id"), nBits = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    // every emitted pair shares its bucket; no pair crosses buckets
    assert(knn.nonEmpty)
    assert(knn.forall { case (a, b) => buckets(a) === buckets(b) })
  }

  test("knnJoin and decontaminateByCosine drop null-embedding rows, never crash") {
    import spark.implicits._
    val withNull = embs.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("id", "emb"))
    // null emb → null band signatures → explodes to zero rows → 99
    // appears as neither id nor nbr
    val knn = Similarity.knnJoin(withNull, col("emb"), col("id"), k = 2,
        nBits = 1, nBands = 1, dim = 2)
      .collect().flatMap(r => Seq(r.getAs[Long]("id"), r.getAs[Long]("nbr")))
    assert(!knn.contains(99L))
    // null emb → null max-cosine → threshold comparison is null → the
    // row is DROPPED (conservative: an incomparable row is not declared
    // clean), and the kernel never throws
    val kept = Similarity.decontaminateByCosine(withNull, col("emb"), col("id"),
        Array(Array(1.0, 0.0)), threshold = 0.99)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(!kept.contains(99L))
    assert(kept === Set(3L, 4L, 5L, 6L, 7L))
  }

  test("decontaminateByCosine drops near-dups of the eval set, keeps the rest") {
    // eval set = the angle-0 direction; threshold 0.99 must drop ids 1-2
    // (cos 1.0, cos(0.1)≈0.995) and keep everything from 0.5 rad out
    val kept = Similarity.decontaminateByCosine(
        embs, col("emb"), col("id"),
        Array(Array(1.0, 0.0)), threshold = 0.99)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept === Set(3L, 4L, 5L, 6L, 7L))
    // two eval vectors: a second direction at 2.0 rad also claims id 5
    val kept2 = Similarity.decontaminateByCosine(
        embs, col("emb"), col("id"),
        Array(Array(1.0, 0.0), Array(math.cos(2.0), math.sin(2.0))), threshold = 0.99)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept2 === Set(3L, 4L, 6L, 7L))
  }
}
