package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BitPack
import graft.functions.VectorFunctions.{asDouble, cosineSimilarity}

/** Binary quantization (BQ) ANN — the 1-BIT rung of the compression
  * ladder below PQ (v10, 8× smaller codes) and SQ8 (v25, 4×): each
  * 64-dim float vector becomes ONE long (256× smaller than raw), the
  * shortlist metric is a single `xor` + `bit_count` per candidate, and
  * the exact metric reranks only the shortlist. This is the coarse
  * filter production vector stores run when even PQ codes blow the
  * memory budget — recall comes from over-fetching (shortlist ≫ k),
  * never from trusting hamming.
  *
  * Thresholds: per-dimension mean (computed over 1e-4-quantized
  * components, so the threshold and every comparison are EXACT
  * integers — no cross-engine float boundary can flip a bit). A
  * centered threshold keeps bits balanced even when the corpus has a
  * dominant common direction (the Similarity.hyperplanes `centered`
  * argument, reduced to the axis-aligned case).
  *
  * Scale shape: training is one partial+final 64-row aggregate;
  * encoding + hamming is a pure row map (pack kernel + codegen'd
  * bit_count — 8 bytes per candidate touched, not 256); the shortlist
  * is TakeOrdered (no shuffle); the rerank touches `shortlist` rows.
  * The corpus never shuffles, and serving reads could come from an
  * 8-byte-per-row packed sidecar at 100 TB.
  */
object BinaryQuant {

  /** Per-dimension quantized thresholds: floor(mean(vq_i) + 0.5) over
    * vq = floor(v·10⁴ + 0.5) — exact-integer inputs, one ≤dim-row
    * aggregate to the driver. */
  def trainThresholds(df: DataFrame, embCol: Column): Array[Long] = {
    val rows = df.filter(embCol.isNotNull)
      .select(posexplode(embCol).as(Seq("i", "v")))
      .select(col("i"), floor(col("v").cast("double") * 10000.0 + 0.5).as("vq"))
      .groupBy(col("i")).agg(sum(col("vq")).as("s"), count(lit(1)).as("c"))
      .collect()
    require(rows.nonEmpty, "binary quant: empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    // The pack is ONE long (1L << i per bit): a corpus wider than 64
    // dims would silently truncate the shortlist metric to the first
    // 64 bits while the oracle counts all of them — fail loud instead.
    require(dim <= 64,
      s"binary quant: packs into a single 64-bit word; corpus has $dim dims")
    val thr = new Array[Long](dim)
    rows.foreach { r =>
      thr(r.getInt(0)) = math.floor(r.getLong(1).toDouble / r.getLong(2).toDouble + 0.5).toLong
    }
    thr
  }

  /** Hamming-shortlist + exact-cosine rerank kNN: (id, score) top-k. */
  def knn(df: DataFrame, embCol: Column, idCol: Column, query: Array[Double],
      thrQ: Array[Long], shortlist: Int, k: Int): DataFrame = {
    require(thrQ.length <= 64,
      s"binary quant: packs into a single 64-bit word; got ${thrQ.length} dims")
    val qPack = BitPack.packVector(query, thrQ)
    val q = array(query.toIndexedSeq.map(lit): _*)
    df.filter(embCol.isNotNull)
      .select(idCol.as("id"), embCol.as("emb"),
        bit_count(BitPack.signPack(embCol, thrQ).bitwiseXOR(lit(qPack))).as("hd"))
      .orderBy(col("hd"), col("id"))
      .limit(shortlist)
      .select(col("id"), round(cosineSimilarity(asDouble(col("emb")), q), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** DuckDB replay: quantized components, integer thresholds, the
    * per-candidate differing-bit count (≡ bit_count(xor) of the packs),
    * the (hd, id) shortlist, the exact-cosine rerank. */
  def oracleSql(queryIdPred: String, shortlist: Int, k: Int): String =
    s"""WITH bqe AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |bqx AS MATERIALIZED (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS vq
       |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) s),
       |bqt AS MATERIALIZED (
       |  SELECT i, CAST(floor(sum(vq) * 1.0 / count(*) + 0.5) AS BIGINT) AS tq
       |  FROM bqx GROUP BY i),
       |bqq AS (SELECT x.i, x.vq > t.tq AS b FROM bqx x JOIN bqt t USING (i)
       |        WHERE $queryIdPred),
       |bqh AS (
       |  SELECT x.vec_id,
       |    sum(CASE WHEN (x.vq > t.tq) <> q.b THEN 1 ELSE 0 END) AS hd
       |  FROM bqx x JOIN bqt t USING (i) JOIN bqq q USING (i)
       |  GROUP BY x.vec_id),
       |bqs AS (SELECT vec_id FROM bqh ORDER BY hd, vec_id LIMIT $shortlist)
       |SELECT e.vec_id AS id,
       |  round(list_cosine_similarity(e.v, (SELECT v FROM bqe WHERE $queryIdPred)), 4) AS score
       |FROM bqe e JOIN bqs USING (vec_id)
       |ORDER BY score DESC, id LIMIT $k""".stripMargin
}
