package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.UnigramOps
import graft.functions.TextFunctions

/** Unigram-LM subword tokenizer (SentencePiece — Kudo 2018, hard-EM /
  * Viterbi variant): the third tokenizer family next to merge-BPE
  * (t39/t42) and byte-BPE (t61). A piece vocabulary with probabilities
  * is trained by alternating Viterbi segmentation (E) and count
  * re-estimation (M); serving segments text under the final vocab.
  * The reference engine has no tokenizer (it is a clustering pipeline,
  * SURVEY §0); this is commissioned training-data-pipeline surface.
  *
  * Design for scale:
  *  - the corpus is tokenized ONCE into a distinct-word frequency
  *    table (Zipf-small vs the corpus; at 100 TB it is the classic
  *    word-count output, shuffled by word hash);
  *  - every EM round runs over THAT table only: the Viterbi kernel
  *    ([[UnigramOps.unigramSeg]], vocab riding as a plan reference
  *    object) is a pure row map, and the count re-estimation is one
  *    partial+final aggregation collecting ≤ |vocab| rows — the
  *    corpus text is never re-scanned (t42's one-argmax-row-per-round
  *    discipline, applied to a whole count table that is still tiny);
  *  - SERVING is shuffle-free: one codegen kernel per row re-segments
  *    words in place (a ≤48-candidate integer DP beats any join).
  *
  * Determinism / bit-portability:
  *  - piece costs are INTEGER-quantized: cost = round(−ln(cnt/total)·1e6)
  *    — ln of identical rationals in both engines, so the DP compares
  *    exact longs (the t53/t62 quantization discipline);
  *  - segmentation minimizes (total cost, space-joined piece string);
  *    the lexicographic tie-break is append-monotone, so the oracle's
  *    brute-force enumeration (recursive CTE over all vocab-valid
  *    paths, ORDER BY cost, seg) picks the identical segmentation;
  *  - training words are capped at [[UnigramOps.MaxWord]] chars
  *    (longer words serve as single-char fallbacks), bounding the
  *    oracle's path enumeration at tetranacci(12) ≈ 1490 paths/word;
  *  - all emitted counts are exact integers.
  *
  * Vocabulary lifecycle: seed = the `seedTopV` most frequent substrings
  * of length 2..[[UnigramOps.MaxPiece]] (ties → lexicographic) plus ALL
  * single chars; each M-step keeps pieces with nonzero Viterbi count,
  * while single chars are floored at count 1 so coverage never breaks
  * (SentencePiece's required-character set).
  */
object UnigramLm {

  val SeedTopV = 256
  val Rounds = 3

  /** The distinct-word frequency table (word, f), trained-length words
    * only. One corpus tokenize pass; localCheckpoint'd because every
    * EM round and the seed derivation re-read it. */
  def wordTable(docs: DataFrame, text: Column): DataFrame =
    docs.filter(text.isNotNull)
      .select(explode(filter(TextFunctions.tokens(text), t => t =!= lit(""))).as("w"))
      .filter(length(col("w")) <= UnigramOps.MaxWord)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint()

  /** Candidate substring pieces with corpus-weighted multiplicity. */
  private def candidates(words: DataFrame): DataFrame =
    words
      .select(col("f"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s ->
           |  transform(sequence(1, least(${UnigramOps.MaxPiece}, length(w) - s + 1)),
           |    l -> substring(w, s, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))

  /** Train: returns the final (piece → count) vocabulary. */
  def fit(docs: DataFrame, text: Column): Map[String, Long] = {
    val words = wordTable(docs, text)
    val cand = candidates(words).localCheckpoint()
    val top = cand.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(SeedTopV)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val singles = cand.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Map[String, Long] = (top ++ singles).toMap
    for (_ <- 1 to Rounds) {
      val costs = costMap(vocab)
      val counted = words
        .select(col("f"), explode(split(
          UnigramOps.unigramSeg(col("w"), costs), " ")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      vocab = vocab.flatMap { case (p, _) =>
        val raw = counted.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(raw, 1L))
        else if (raw > 0L) Some(p -> raw)
        else None
      }
    }
    vocab
  }

  /** Integer piece costs from counts: round(−ln(cnt/total)·1e6). */
  def costMap(vocab: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val total = vocab.values.sum
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      m.put(p, math.round(-math.log(c.toDouble / total.toDouble) * 1e6))
    }
    m
  }

  /** The trained vocabulary as a DataFrame (t73's output). */
  def vocabTable(spark: SparkSession, vocab: Map[String, Long]): DataFrame = {
    import spark.implicits._
    vocab.toSeq.sortBy(_._1).toDF("piece", "cnt")
  }

  /** Serve: per-doc (n_words, n_pieces, fertility) under the trained
    * vocab — one shuffle-free kernel pass. Docs with no tokens are
    * dropped (both engines). */
  def tokenStats(docs: DataFrame, text: Column, id: Column,
      vocab: Map[String, Long]): DataFrame = {
    val costs = costMap(vocab)
    docs.filter(text.isNotNull)
      // kernel behind a Generate barrier: the n_words filter below
      // would otherwise substitute THROUGH the projection and re-run
      // the whole DP per reference (t17/t19 precedent)
      .select(id.as("id"),
        explode(array(UnigramOps.unigramStats(text, costs))).as("st"))
      .filter(col("st.n_words") > 0)
      .select(col("id"),
        col("st.n_words").cast("long").as("n_words"),
        col("st.n_pieces").cast("long").as("n_pieces"),
        round(col("st.n_pieces").cast("double") / col("st.n_words") + lit(1e-9), 4)
          .as("fertility"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle twins
  // ------------------------------------------------------------------

  /** Shared CTE prefix replaying the ENTIRE training: word table, seed
    * candidates, top-V + singles, then [[Rounds]] hard-EM rounds, each
    * a recursive-CTE Viterbi enumeration + count re-estimation. The
    * final vocab CTE is named `uv$Rounds`. Starts with WITH RECURSIVE
    * (callers append their own CTEs + SELECT). */
  def trainCtes(textCol: String): String = {
    import TextFunctions.Sql
    val mp = UnigramOps.MaxPiece
    val mw = UnigramOps.MaxWord
    val base =
      s"""WITH RECURSIVE uw AS MATERIALIZED (
         |  SELECT t AS w, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(list_filter(string_split(${Sql.normalizeText(textCol)}, ' '),
         |          x -> x <> '')) AS t
         |        FROM documents WHERE $textCol IS NOT NULL)
         |  WHERE len(t) <= $mw GROUP BY t),
         |ucand AS MATERIALIZED (
         |  SELECT substr(w, s, l) AS piece, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM uw, LATERAL (SELECT unnest(generate_series(1, len(w))) AS s) ss,
         |       LATERAL (SELECT unnest(generate_series(1, least($mp, len(w) - s + 1))) AS l) ll
         |  GROUP BY 1),
         |uv0 AS MATERIALIZED (
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM ucand WHERE len(piece) >= 2
         |    ORDER BY cnt DESC, piece LIMIT $SeedTopV)
         |  UNION ALL
         |  SELECT piece, cnt FROM ucand WHERE len(piece) = 1)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      val prev = s"uv${r - 1}"
      s"""uc$r AS MATERIALIZED (
         |  SELECT piece, len(piece) AS l,
         |    CAST(floor(-ln(CAST(cnt AS DOUBLE) /
         |      (SELECT CAST(sum(cnt) AS DOUBLE) FROM $prev)) * 1000000.0 + 0.5) AS BIGINT) AS cost
         |  FROM $prev),
         |up$r(w, f, pos, seg, cost) AS (
         |  SELECT w, f, 0, '', CAST(0 AS BIGINT) FROM uw
         |  UNION ALL
         |  SELECT p.w, p.f, p.pos + v.l,
         |    CASE WHEN p.seg = '' THEN v.piece ELSE p.seg || ' ' || v.piece END,
         |    p.cost + v.cost
         |  FROM up$r p JOIN uc$r v ON substr(p.w, p.pos + 1, v.l) = v.piece
         |  WHERE p.pos < len(p.w)),
         |ub$r AS MATERIALIZED (
         |  SELECT w, f, seg FROM (
         |    SELECT w, f, seg, row_number() OVER (PARTITION BY w ORDER BY cost, seg) AS rn
         |    FROM up$r WHERE pos = len(w)) WHERE rn = 1),
         |un$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (SELECT f, unnest(string_split(seg, ' ')) AS piece FROM ub$r)
         |  GROUP BY piece),
         |uv$r AS MATERIALIZED (
         |  SELECT v.piece,
         |    greatest(coalesce(c.cnt, CAST(0 AS BIGINT)),
         |      CASE WHEN len(v.piece) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS cnt
         |  FROM uv${r - 1} v LEFT JOIN un$r c ON c.piece = v.piece
         |  WHERE coalesce(c.cnt, 0) > 0 OR len(v.piece) = 1)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** t73's oracle: the trained vocabulary. */
  def trainOracleSql(textCol: String): String =
    s"""${trainCtes(textCol)}
       |SELECT piece, cnt FROM uv$Rounds ORDER BY piece""".stripMargin

  /** t74's oracle: replay training, then segment every document under
    * the final costs — distinct doc words ≤ MaxWord chars go through
    * the same Viterbi enumeration; longer words count len(w) single-char
    * pieces; per-doc sums join back through the token explode. */
  def serveOracleSql(textCol: String, idCol: String): String = {
    import TextFunctions.Sql
    val mw = UnigramOps.MaxWord
    val R = Rounds
    s"""${trainCtes(textCol)},
       |ufc AS MATERIALIZED (
       |  SELECT piece, len(piece) AS l,
       |    CAST(floor(-ln(CAST(cnt AS DOUBLE) /
       |      (SELECT CAST(sum(cnt) AS DOUBLE) FROM uv$R)) * 1000000.0 + 0.5) AS BIGINT) AS cost
       |  FROM uv$R),
       |udt AS MATERIALIZED (
       |  SELECT $idCol AS id, unnest(list_filter(string_split(${Sql.normalizeText(textCol)}, ' '),
       |    x -> x <> '')) AS w
       |  FROM documents WHERE $textCol IS NOT NULL),
       |udw AS MATERIALIZED (SELECT DISTINCT w FROM udt WHERE len(w) <= $mw),
       |usp(w, pos, seg, cost, np) AS (
       |  SELECT w, 0, '', CAST(0 AS BIGINT), 0 FROM udw
       |  UNION ALL
       |  SELECT p.w, p.pos + c.l,
       |    CASE WHEN p.seg = '' THEN c.piece ELSE p.seg || ' ' || c.piece END,
       |    p.cost + c.cost, p.np + 1
       |  FROM usp p JOIN (
       |    SELECT piece, l, cost FROM ufc
       |    UNION ALL
       |    SELECT sc.piece, 1 AS l, CAST(${UnigramOps.UnkCost} AS BIGINT) AS cost
       |    FROM (SELECT DISTINCT substr(w, gs.g, 1) AS piece
       |          FROM udw, LATERAL (SELECT unnest(generate_series(1, len(w))) AS g) gs) sc
       |    WHERE sc.piece NOT IN (SELECT piece FROM ufc WHERE l = 1)
       |  ) c ON substr(p.w, p.pos + 1, c.l) = c.piece
       |  WHERE p.pos < len(p.w)),
       |unp AS MATERIALIZED (
       |  SELECT w, np FROM (
       |    SELECT w, np, row_number() OVER (PARTITION BY w ORDER BY cost, seg) AS rn
       |    FROM usp WHERE pos = len(w)) WHERE rn = 1)
       |SELECT t.id AS $idCol,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN len(t.w) > $mw THEN len(t.w) ELSE p.np END) AS BIGINT) AS n_pieces,
       |  round(sum(CASE WHEN len(t.w) > $mw THEN len(t.w) ELSE p.np END) * 1.0
       |    / count(*) + 1e-9, 4) AS fertility
       |FROM udt t LEFT JOIN unp p ON p.w = t.w
       |GROUP BY t.id ORDER BY t.id""".stripMargin
  }
}
