package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport
import graft.functions.TextFunctions

/** Null propagation through the operator surface — real corpora carry
  * null text/payload/embedding cells, and every operator must pass them
  * through (or drop them) rather than throw. */
class NullSafetySpec extends AnyFunSuite with SparkTestSupport {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, Option("the quick brown fox jumps")), (2L, None), (3L, Option("")))
      .toDF("doc_id", "text")
  }

  test("text kernels: null in, null out; no crash") {
    val r = docs.select(
        col("doc_id"),
        graft.expressions.TextHash.minHashSig(col("text"), 3, 8).as("mh"),
        graft.expressions.TextHash.simHash64(col("text")).as("sh"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.langId(col("text")).as("lang"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(r(2L).isNullAt(1) && r(2L).isNullAt(2) && r(2L).isNullAt(3))
    assert(!r(1L).isNullAt(1))
    assert(r(3L).isNullAt(1)) // empty text → empty shingles → NULL sig
  }

  test("dedup pipeline skips null-text docs in candidate pairs") {
    val pairs = Dedup.minHashCandidatePairs(docs, col("text"), col("doc_id"))
    assert(pairs.count() === 0) // no crash, nulls never pair
    assert(Dedup.exact(docs, col("text"), col("doc_id")).count() === 3)
  }

  test("similarity search tolerates null embeddings") {
    import spark.implicits._
    val embs = Seq(
      (1L, Option(Array(1.0f, 0.0f))), (2L, Option(Array(0.9f, 0.1f))), (3L, None)
    ).toDF("id", "emb")
    val knn = Similarity.bruteForceKnn(embs, col("emb"), col("id"), Array(1.0, 0.0), 5)
      .collect()
    // null embedding yields null score, sorted last (desc nulls last)
    assert(knn.length === 3)
    assert(knn.take(2).map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L))
    // centered=false: a 2-vector corpus IS the degenerate case where
    // both vectors sit at the mean and centered bucketing splits them
    val pairs = Similarity.cosineNearDupPairs(embs, col("emb"), col("id"),
      threshold = 0.5, nBits = 2, nBands = 2, dim = 2, centered = false)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("batched ANN paths drop null-embedding queries, never crash") {
    import spark.implicits._
    val corpus = (0 until 20).map(i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)))
      .toDF("id", "emb")
    val queries = Seq(
      (100L, Option(Array(1.0f, 0.0f))), (101L, None)
    ).toDF("qid", "emb")
    // IVFADC batch: the null query's nearest_lists is null → explode
    // drops it; the non-null query still gets its full top-k
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val cb = Array.fill(2)(Array(Array(0.0), Array(1.0)))
    val idx = Pq.ivfPqIndex(corpus, col("emb"), col("id"), cents, cb)
    val got = Pq.ivfPqKnnBatch(idx, queries, col("emb"), col("qid"),
        cents, cb, k = 4, nProbe = 2)
      .collect().map(_.getAs[Long]("qid"))
    assert(got.toSet === Set(100L) && got.length === 4)
  }

  test("canonicalPerCluster: null scores lose to scored members, never crash") {
    import spark.implicits._
    // doc 2's score is null: desc ordering puts nulls last in Spark,
    // so the scored member 1 wins its cluster; a null-scored singleton
    // still keeps itself
    val scored = Seq((1L, Option(0.4)), (2L, None), (9L, None))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalPerCluster(scored, col("doc_id"), col("q"), pairs)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 9L -> 1))
  }

  test("binary operators tolerate null payloads") {
    import spark.implicits._
    val bins = Seq((1L, Option("data".getBytes)), (2L, None)).toDF("id", "payload")
    val meta = Multimodal.binaryMeta(bins, col("payload"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(meta(2L).isNullAt(1)) // byte_len null
    val feats = bins.select(Multimodal.extractFeatures(col("payload"), 4).as("f"))
      .collect()
    assert(feats.count(_.isNullAt(0)) === 1)
    assert(Multimodal.frameSample(bins, col("payload"), col("id"), 2, 1).count() === 2)
  }
}
