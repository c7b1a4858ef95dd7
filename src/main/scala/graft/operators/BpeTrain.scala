package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.Bpe
import graft.functions.TextFunctions

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — learning
  * the merges table from the corpus, the half of the tokenizer story
  * [[graft.expressions.Bpe]]'s compile-time table encodes against.
  *
  * The classic iterative loop, each round a bounded Spark job (the
  * v19 k-means shape):
  *
  *  1. ONE corpus scan builds the word-TYPE frequency table — the
  *     standard trainer optimization: all downstream rounds run over
  *     distinct words weighted by frequency, never over the corpus
  *     again. This is the only corpus-sized job; at 100 TB it is one
  *     partial+final count shuffle keyed by word.
  *  2. Per round: count adjacent token pairs (freq-weighted, OVERLAPPING
  *     occurrences included — 'a|a|a' contributes 2 to (a,a), the
  *     canonical get_stats), partial+final agg over the word table;
  *     argmax with the deterministic tie-break (count DESC, then
  *     lexicographic x, y); re-encode every word by the winning merge
  *     with the SAME leftmost-first fold the encode kernel runs
  *     ([[graft.expressions.Bpe.applyMerge]]).
  *
  * The word table stays a DataFrame — per-round state is eagerly
  * localCheckpoint'ed (the connectedComponents lineage-cut idiom) so
  * the plan never accumulates across rounds, and only the single
  * argmax ROW is ever collected per round (multilingual corpora have
  * 10⁸ word types; the table itself must never visit the driver).
  *
  * Learned tables are well-formed by construction (every token in any
  * encoding is a single char or an earlier merge's output), so they
  * compile straight into [[graft.expressions.Bpe.encodeWith]] — and
  * the rank-order encode there is provably the priority-loop encode.
  */
object BpeTrain {

  /** One learned merge: `rank` is 1-based priority order, `cnt` the
    * freq-weighted adjacent-pair count that won the round's argmax. */
  final case class Merge(rank: Int, x: String, y: String, cnt: Long)

  /** (word, freq, enc) — the word-type frequency table with each word
    * char-split to its initial '|'-joined encoding. The one
    * corpus-sized job of a training run. */
  def wordTable(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(textCol)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("enc", expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), '|')"))

  /** Persist a learned table as parquet (rank, x, y, cnt) — the
    * artifact a training run ships; [[load]] restores it in rank
    * order. A tokenizer is useless unless the exact table that
    * encoded the corpus can be re-served later, so the round-trip is
    * part of the operator (BpeTrainSpec asserts save→load→encode
    * equals the in-memory table). */
  def save(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
      dir: String): Unit =
    spark.createDataFrame(merges)
      .select(col("rank"), col("x"), col("y"), col("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Vector[Merge] =
    spark.read.parquet(dir)
      .orderBy(col("rank"))
      .collect()
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("x"),
        r.getAs[String]("y"), r.getAs[Long]("cnt")))
      .toVector

  /** BYTE-level word table for [[trainBytes]]: words split on single
    * spaces with NO normalization (byte-level's zero-OOV contract
    * starts at training), each word's initial encoding its UTF-8 bytes
    * as '|'-joined lowercase-hex pairs — the exact base alphabet
    * [[graft.expressions.ByteBpe]] serves. */
  def byteWordTable(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("h", lower(hex(encode(col("word"), "UTF-8"))))
      .withColumn("enc", expr(
        "array_join(transform(sequence(1, length(h) div 2), i -> substring(h, 2*i-1, 2)), '|')"))
      .drop("h")

  /** Learn `nMerges` merges from the corpus. Stops early only when no
    * adjacent pair exists at all (every word fully merged to one
    * token). Deterministic: the argmax total order is
    * (cnt DESC, x ASC, y ASC) and every input to it is an exact
    * integer count. */
  def train(docs: DataFrame, textCol: Column, nMerges: Int): Vector[Merge] =
    trainRounds(wordTable(docs, textCol), nMerges)

  /** [[train]]'s byte-level twin: same loop, same argmax order, the
    * byte word table as round-0 state. The learned table is
    * well-formed for [[graft.expressions.ByteBpe.ByteTable]] by
    * construction (operands are single bytes or earlier outputs) and
    * can never collide with a reserved token (outputs are always
    * even-length lowercase hex; reserved tokens are validated
    * non-hex-shaped). */
  def trainBytes(docs: DataFrame, textCol: Column, nMerges: Int): Vector[Merge] =
    trainRounds(byteWordTable(docs, textCol), nMerges)

  private def trainRounds(words: DataFrame, nMerges: Int): Vector[Merge] = {
    var cur = words.localCheckpoint(true)
    val learned = Vector.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // freq-weighted adjacent-pair counts: explode each word's
      // (t[i-1], t[i]) positions, one partial+final agg — never wider
      // than the word-type table
      val top = cur
        .filter(col("enc").contains("|"))
        .select(col("freq"), split(col("enc"), "\\|").as("t"))
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS x, t[i] AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1)
        .collect() // exactly ONE row per round crosses to the driver
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, cnt) =
          (top(0).getAs[String]("x"), top(0).getAs[String]("y"), top(0).getAs[Long]("cnt"))
        learned += Merge(rank, x, y, cnt)
        cur = cur.withColumn("enc", Bpe.applyMerge(col("enc"), x, y))
          .localCheckpoint(true)
        rank += 1
      }
    }
    learned.result()
  }
}
