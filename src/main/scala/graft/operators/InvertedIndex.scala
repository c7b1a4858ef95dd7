package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term → postings inverted index: the serving structure behind keyword
  * retrieval over a document corpus (filtering a training corpus by
  * topic terms, contamination term lookups, "every doc mentioning X"
  * audits). The relational formulation of what Lucene does — built and
  * served entirely as Spark plans over parquet.
  *
  * Build: one tokenize pass → DISTINCT (term, doc_id) postings →
  * written `partitionBy(bucket)` where `bucket = pmod(hash(term), n)`.
  * Hash-bucketing (not `partitionBy(term)`) bounds the directory count:
  * a real vocabulary is millions of terms — one directory per term
  * would melt the file listing; term-hash buckets keep ~|vocab|/n terms
  * per directory at any vocabulary size.
  *
  * Serve: a q-term AND query reads ONLY the query terms' buckets —
  * the bucket predicate is a literal IN over the partition column, so
  * pruning happens at file-LISTING time (PartitionFilters, the
  * v07/v16 serving discipline); within them, `term IN (...)` pushes to
  * the parquet scan. Intersection is a count-per-doc aggregate — the
  * postings are distinct by construction, so `count(*) = q` IS the
  * AND, no `countDistinct` state. Nothing but matched doc ids ever
  * leaves the probed buckets.
  *
  * The bucket count is stamped into `_meta.json` at build time and
  * re-read at serve time — a caller guessing a different modulus would
  * silently probe the wrong directories (the v21 fingerprint
  * discipline: layout parameters travel WITH the layout).
  */
object InvertedIndex {

  /** Tokenize `textCol` ([[graft.functions.TextFunctions.tokens]]),
    * dedup to (term, doc_id), bucket, and write under `dir`. */
  def build(docs: DataFrame, idCol: Column, textCol: Column,
      nBuckets: Int, dir: String): Unit = {
    require(nBuckets > 0, s"invertedIndex: nBuckets must be positive: $nBuckets")
    docs.select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_meta.json"), s"""{"nBuckets":$nBuckets}""")
  }

  private def readNBuckets(dir: String): Int = {
    val meta = java.nio.file.Paths.get(dir, "_meta.json")
    require(java.nio.file.Files.exists(meta),
      s"invertedIndex: $dir has no _meta.json — not a built index")
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(meta)).get("nBuckets").asInt()
  }

  /** Append new documents' postings under the STORED bucket modulus —
    * incremental index growth (the v21 discipline: an increment encoded
    * under a guessed modulus would land terms in the wrong directories
    * and silently vanish from lookups; reading `_meta.json` makes that
    * impossible). Caller contract: `docs` are NEW doc ids — re-adding
    * an id duplicates its postings (delete it first). */
  def append(docs: DataFrame, idCol: Column, textCol: Column, dir: String): Unit = {
    val n = readNBuckets(dir)
    docs.select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .withColumn("bucket", pmod(hash(col("term")), lit(n)))
      .write.mode("append").partitionBy("bucket").parquet(dir)
  }

  /** Tombstone whole documents (takedowns, dedup removals). Doc-level —
    * one tombstone row per id under `dir/_deletes/`, NOT a per-term
    * rewrite: a delete costs O(1) rows no matter how many terms the
    * document had. Idempotent (re-deleting dedups at read). */
  def delete(spark: SparkSession, dir: String, docIds: Seq[Long]): Unit = {
    require(docIds.nonEmpty, "invertedIndex: empty delete set")
    import spark.implicits._
    docIds.toDF("doc_id").write.mode("append")
      .parquet(java.nio.file.Paths.get(dir, "_deletes").toString)
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = java.nio.file.Paths.get(dir, "_deletes")
    if (java.nio.file.Files.exists(p)) Some(spark.read.parquet(p.toString).distinct())
    else None
  }

  /** Rewrite the postings without tombstoned docs and clear the
    * tombstones — bounds the serve-time anti-join as deletes pile up.
    * The rewrite lands in a fresh directory (readers of the old one
    * are never torn); the returned path is the new index root. */
  def compact(spark: SparkSession, dir: String, outDir: String): String = {
    val n = readNBuckets(dir)
    val live = tombstones(spark, dir) match {
      case Some(t) => spark.read.parquet(dir).join(t, Seq("doc_id"), "left_anti")
      case None => spark.read.parquet(dir)
    }
    live.select(col("doc_id"), col("term"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "_meta.json"), s"""{"nBuckets":$n}""")
    outDir
  }

  /** Doc ids containing ALL of `terms` (conjunctive keyword query).
    * Terms are normalized-token literals; unknown terms simply match
    * nothing (an AND including one returns empty). */
  def lookupAll(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "invertedIndex: at least one query term")
    val distinctTerms = terms.distinct
    val n = readNBuckets(dir)
    // bucket literals come from Spark's own hash on a local relation —
    // the ONE way to guarantee the serve-side modulus bit-matches the
    // build-side kernel (a JVM-side reimplementation could drift)
    import spark.implicits._
    val buckets = distinctTerms.toDF("term")
      .select(pmod(hash(col("term")), lit(n)).as("bucket"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val matched = spark.read.parquet(dir)
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      // postings are distinct (term, doc_id) ⇒ plain count is the
      // distinct-term count — no countDistinct state per doc
      .agg(count(lit(1)).as("__nt"))
      .filter(col("__nt") === distinctTerms.size)
      .select(col("doc_id"))
    // tombstones apply AFTER the intersection — the anti join runs on
    // the result-sized hit set, not the postings (v22's live-view
    // ordering argument); the `_deletes` dir is `_`-prefixed, so the
    // postings scan never reads it
    tombstones(spark, dir) match {
      case Some(t) => matched.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => matched
    }
  }
}
