package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines, at 100 TB scale:
  *
  *  - [[exact]]: hash-groupBy on a content fingerprint. One shuffle keyed
  *    by a 128-bit md5 — uniformly distributed, no skew, map-side
  *    partial agg keeps the shuffle tiny.
  *  - [[minHashSignatures]] / [[minHashCandidatePairs]]: MinHash + LSH
  *    banding. Candidate generation is a self-join on (band, bandHash)
  *    buckets — the classic near-dup pipeline that avoids the O(n²)
  *    cross join entirely; only bucket-mates are compared.
  *  - [[simHashSignatures]]: 64-bit SimHash over tokens (Hamming-space
  *    near-dup key).
  *  - [[ngramJaccard]]: exact shingle-set Jaccard for verifying candidate
  *    pairs (the "verify" stage after LSH "block").
  *
  * All stages are built from codegen'd built-ins (hash/HOFs) — no UDF,
  * no collect; every step is a narrow map or a keyed shuffle.
  */
object Dedup {

  /** Exact dedup: keep the minimum id per content fingerprint.
    * Returns (fingerprint, keep_id, dup_count). */
  def exact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(TextFunctions.fingerprint(textCol).as("fingerprint"), idCol.as("id"))
      .groupBy($"fingerprint")
      .agg(min($"id").as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles of the normalized text. Returns an array column;
    * empty when the document has fewer than n tokens. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(textCol)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** k MinHash values over the shingle set. Uses Spark's murmur3 `hash`
    * with the permutation index mixed in as a first argument — k
    * independent-enough hash families, deterministic across runs. */
  def minHashArray(shingleCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(
        array_min(transform(shingleCol, s => hash(lit(i), s))),
        lit(Int.MaxValue))
    }: _*)

  /** (id, minhash[k]) signatures. */
  def minHashSignatures(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16): DataFrame =
    df.select(idCol.as("id"), minHashArray(shingles(textCol, n), k).as("minhash"))

  /** LSH banding: split the k-wide signature into bands of `rowsPerBand`,
    * bucket docs by (band index, hash of band slice), and emit candidate
    * pairs (a < b) that share ≥1 bucket. Skew-safe: bucket sizes are
    * bounded by true near-dup group sizes, not data volume. */
  def minHashCandidatePairs(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sigs = minHashSignatures(df, textCol, idCol, n, k)
    val nBands = k / rowsPerBand
    val banded = sigs.select(
      $"id",
      posexplode(array((0 until nBands).map { b =>
        hash(slice($"minhash", b * rowsPerBand + 1, rowsPerBand).cast("string"))
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with estimated Jaccard ≥ threshold:
    * LSH candidates verified by signature agreement fraction. */
  def minHashPairs(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sigs = minHashSignatures(df, textCol, idCol, n, k)
    val cand = minHashCandidatePairs(df, textCol, idCol, n, k, rowsPerBand)
    cand
      .join(sigs.select($"id".as("id_a"), $"minhash".as("mh_a")), "id_a")
      .join(sigs.select($"id".as("id_b"), $"minhash".as("mh_b")), "id_b")
      .withColumn("est_jaccard",
        round(
          aggregate(
            zip_with($"mh_a", $"mh_b", (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / k, 4))
      .filter($"est_jaccard" >= threshold)
      .select($"id_a", $"id_b", $"est_jaccard")
  }

  /** 64-bit SimHash over the tokens of the normalized text: per bit,
    * sum +1/−1 votes from each token's murmur hash (two 32-bit halves
    * via seeds 0 and 1), then take the sign. */
  def simHash64(textCol: Column): Column = {
    val toks = TextFunctions.tokens(textCol)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h1 = hash(t).cast("long")
        val h2 = hash(lit(1), t).cast("long")
        zip_with(acc, sequence(lit(0), lit(63)), (a, i) => {
          val h = when(i < 32, h1).otherwise(h2)
          val bit = call_function("shiftright", h, (i % 32).cast("int")).bitwiseAND(1)
          a + when(bit === 1, 1).otherwise(-1)
        })
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact n-gram Jaccard similarity of two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, round(inter / union, 4)).otherwise(lit(0.0))
  }

  private implicit class Str(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
