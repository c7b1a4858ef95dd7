package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Vector / similarity-search surface over `embeddings`
  * (64-d float vectors): norms, exact brute-force kNN, LSH-bucketed
  * approximate kNN, embedding near-dup pairs.
  */
object VectorQueries {
  import QueryDef._

  /** Driver-side fetch of one query vector (vec_id = 0), as double. */
  private def queryVector(s: org.apache.spark.sql.SparkSession, d: String): Array[Double] =
    Tables.embeddings(s, d)
      .filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray

  val all: Seq[QueryDef] = Seq(
    sql(
      "v01_vec_norm",
      """SELECT vec_id, round(sqrt(sum(x * x)), 4) AS l2norm
        |FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), round(norm2(asDouble(col("embedding"))), 4).as("l2norm"))
        .orderBy(col("vec_id"))
    },

    sql(
      "v02_knn_bruteforce",
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id AS id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 4) AS score
        |FROM embeddings
        |ORDER BY score DESC, id
        |LIMIT 10""".stripMargin) { (s, d) =>
      Similarity.bruteForceKnn(
        Tables.embeddings(s, d), col("embedding"), col("vec_id"),
        queryVector(s, d), 10)
    },

    // LSH-bucketed kNN (bucket membership depends on seeded hyperplanes;
    // not expressible in DuckDB) → rows-only.
    rowsOnly("v03_knn_lsh") { (s, d) =>
      Similarity.lshKnn(
        Tables.embeddings(s, d), col("embedding"), col("vec_id"),
        queryVector(s, d), 10, nBits = 4)
    },

    // LSH bucket histogram: shows the signature computation + distribution.
    rowsOnly("v04_lsh_buckets") { (s, d) =>
      Similarity.lshBuckets(Tables.embeddings(s, d), col("embedding"), col("vec_id"), nBits = 4)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // Embedding cosine near-dup pairs via LSH self-join → rows-only.
    // Threshold calibrated to the synthetic embeddings (max pairwise
    // cosine ≈ 0.51, p99 ≈ 0.29): 0.2 with 3-bit buckets yields a
    // small but non-empty pair set at every SF.
    // Single band of 3 bits: this is a low-threshold (0.2) demo over
    // near-orthogonal synthetic vectors, where banding cannot be tight;
    // real near-dup thresholds (≥0.9) use the multi-band default (m05).
    rowsOnly("v05_cosine_neardup") { (s, d) =>
      Similarity.cosineNearDupPairs(
          Tables.embeddings(s, d), col("embedding"), col("vec_id"),
          threshold = 0.2, nBits = 3, nBands = 1)
        .orderBy(col("id_a"), col("id_b"))
    },

    // IVF approximate kNN: the trained G-Stream prototypes double as the
    // coarse quantizer; rank within the 2 probed lists → rows-only
    // (centroids come from the model, not SQL).
    rowsOnly("v06_knn_ivf") { (s, d) =>
      Similarity.ivfKnn(
        Tables.embeddings(s, d), col("embedding"), col("vec_id"),
        graft.GngQueries.trained(s, d).centroids,
        queryVector(s, d), k = 10, nProbe = 2)
    }
  )
}
