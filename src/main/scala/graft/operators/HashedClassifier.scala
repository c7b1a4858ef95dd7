package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** fastText-style HASHED-n-gram classifier — [[TextClassifier]]'s
  * 4 hand-picked features generalized to a learned weight per hash
  * bucket: word unigrams AND adjacent bigrams hash into D buckets (the
  * hashing trick — no vocabulary table, bounded memory, collisions
  * embraced), and a linear model trains over the bucket occurrences
  * with the same bit-portable machinery as t53 (softsign link,
  * 1e-6-quantized integer gradient sums), so the DuckDB oracle replays
  * the ENTIRE fit statically ([[oracleSql]]).
  *
  * Scale shape, per round: margins are a pure row map over the cached
  * (y, buckets) table with the weights riding as a plan literal (D+1
  * doubles — the centroid-broadcast idiom); the gradient is ONE
  * partial+final aggregation of (bucket, quantized-contribution)
  * occurrence rows into ≤ D+1 result rows, and only those rows reach
  * the driver. Text never shuffles — gram strings die inside the hash;
  * only int buckets move. SCORING is shuffle-free: grams → buckets →
  * sorted fold, one codegen pass per row (the z fold runs INSIDE the
  * row over array expressions — no explode, no join).
  *
  * Bit-portability (t53's argument, restated for the sparse case):
  *  - z folds left-to-right from the bias over the doc's OCCURRENCE
  *    terms in sorted-bucket order — both engines construct the same
  *    sorted int list and fold the same correctly-rounded products
  *    w[b]·X (X = 1/16, exact in binary);
  *  - each occurrence's gradient contribution quantizes to a 1e-6
  *    INTEGER before summation → bucket sums are exact integer
  *    arithmetic under any partitioning and any engine;
  *  - the weight update is the same correctly-rounded expression
  *    shape both sides. Weights are bit-identical round by round.
  */
object HashedClassifier {

  /** Hash buckets; w carries D+1 entries, bias first. */
  val D = 64

  /** Per-occurrence feature value — 1/16, exact in binary: z lands in
    * softsign's responsive range for typical documents (~40–120 gram
    * occurrences → |z·w̄| small). */
  val X: Double = 0.0625

  private val Q = 1000000.0

  /** The doc's gram-occurrence buckets, SORTED ascending (canonical
    * fold order): unigrams + adjacent bigrams of the normalized
    * tokens, each hashed md5-first-4-hex-digits mod D. One fused
    * codegen kernel ([[graft.expressions.HashedOps]]) — the
    * higher-order-function formulation is CodegenFallback and benched
    * ~1 ms/row; HashedClassifierSpec pins kernel == HOF equality. */
  def buckets(text: Column): Column =
    graft.expressions.HashedOps.hashedBuckets(text, D)

  /** The HOF formulation of [[buckets]] — kept as the kernel's
    * executable spec (the equality is asserted, not assumed). */
  private[operators] def bucketsHof(text: Column): Column = {
    val toks = filter(TextFunctions.tokens(text), t => t =!= lit(""))
    val bigrams = transform(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      (t, i) => concat(t, lit(" "), element_at(toks, (i + 2).cast("int"))))
    sort_array(transform(concat(toks, bigrams),
      g => conv(substring(md5(g.cast("binary")), 1, 4), 16, 10).cast("int") % D))
  }

  private def softsign(z: Column): Column =
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))

  /** z = fold(bias, sorted occurrence terms w[b]·X) — the exact fold
    * order the DuckDB twin mirrors with list_prepend + list_reduce,
    * as a codegen kernel (weights ride as a plan reference object). */
  private def zOf(w: Array[Double], bk: Column): Column =
    graft.expressions.HashedOps.hashedZ(bk, w, X)

  /** zOf's HOF spec twin (HashedClassifierSpec equality). */
  private[operators] def zOfHof(w: Array[Double], bk: Column): Column = {
    val wl = lit(w)
    aggregate(
      transform(bk, b => element_at(wl, b + 2) * lit(X)),
      lit(w(0)), (acc, t) => acc + t)
  }

  /** Train `rounds` full-batch GD steps from w = 0 (bias first, D+1
    * entries). The (y, buckets) table is computed once and cached;
    * each round collects ≤ D+1 integer rows and a count. */
  def fit(docs: DataFrame, text: Column, label: Column,
      lr: Double = 8.0, rounds: Int = 40): Array[Double] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val feat = docs.filter(text.isNotNull)
      .select(label.cast("double").as("y"), buckets(text).as("bk"))
      .cache()
    try {
      var w = new Array[Double](D + 1)
      for (_ <- 1 to rounds) {
        val rows = feat
          // z behind a Generate barrier: softsign references z twice
          // and higher-order functions don't codegen, so an inlined z
          // would re-run the whole fold per reference (and the
          // gradient would pay it again) — one evaluation per row
          .select(col("y"), col("bk"), explode(array(zOf(w, col("bk")))).as("z"))
          .withColumn("margin", softsign(col("z")) - col("y"))
          // occurrence rows: bias sentinel (bucket −1, x = 1) + every
          // gram occurrence (x = X); quantize per occurrence, sum
          // exactly per bucket; n rides as the sentinel's count
          .select(col("margin"), explode(concat(array(lit(-1)), col("bk"))).as("b"))
          .groupBy(col("b"))
          .agg(
            sum(when(col("b") === -1, floor(col("margin") * lit(Q) + lit(0.5)))
              .otherwise(floor(col("margin") * lit(X) * lit(Q) + lit(0.5)))
              .cast("long")).as("g"),
            count(lit(1)).as("c"))
          .collect()
        val gm = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
        val n = rows.find(_.getInt(0) == -1).map(_.getLong(2)).getOrElse(0L)
        require(n > 0L, "hashed classifier: training corpus has no non-null-text rows")
        w = Array.tabulate(D + 1)(k =>
          w(k) - lr * (gm.getOrElse(k - 1, 0L).toDouble / (n.toDouble * Q)))
      }
      w
    } finally { feat.unpersist() }
  }

  /** Score every document: (id, y, score, pred) on the 1e-6 grid —
    * t53's serve contract, here a SHUFFLE-FREE row map (the z fold is
    * an array expression, not a join). */
  def score(docs: DataFrame, text: Column, id: Column, label: Column,
      w: Array[Double]): DataFrame = {
    require(w.length == D + 1,
      s"weights must have ${D + 1} entries (bias first): ${w.length}")
    // z once per row (Generate barrier — see fit()): without it the
    // softsign + grid-floor chain re-evaluates the interpreted HOF
    // fold several times per row (benched 5.3 s → 0.3 s at sf0.1)
    val s = softsign(col("z"))
    docs.filter(text.isNotNull)
      .select(id.as("id"), label.cast("long").as("y"),
        explode(array(zOf(w, buckets(text)))).as("z"))
      .select(col("id"), col("y"),
        (floor(s * lit(Q) + lit(0.5)).cast("long") / lit(Q)).as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
  }

  /** DuckDB twin: the full hashed-gram train-then-score pipeline as
    * ONE static SQL query — feature CTE, then per round a margin CTE,
    * a bucket-gradient CTE and a LIST-valued weight CTE, final
    * scoring. Every CTE MATERIALIZED (t53's lesson: plain CTEs inline
    * per reference → exponential blowup). */
  def oracleSql(textCol: String, labelPred: String, idCol: String,
      lr: Double = 8.0, rounds: Int = 40): String = {
    import TextFunctions.Sql
    def fmt(x: Double): String =
      if (x == math.floor(x) && math.abs(x) < 1e15) s"${x.toLong}.0" else x.toString
    val xS = fmt(X)
    val qS = fmt(Q)
    def sig(e: String) = s"(0.5 + 0.5 * (($e) / (1.0 + abs($e))))"
    def z(wRef: String) =
      s"list_reduce(list_prepend($wRef.w[1], list_transform(bk, " +
        s"b -> $wRef.w[b + 2] * $xS)), (a, t) -> a + t)"
    val feats =
      s"""hfeats AS MATERIALIZED (
         |  SELECT $idCol AS id,
         |    CAST(CASE WHEN __lp THEN 1 ELSE 0 END AS DOUBLE) AS y,
         |    list_sort(list_transform(
         |      t || list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]),
         |      g -> CAST(CAST(('0x' || substr(md5(g), 1, 4)) AS BIGINT) % $D AS INTEGER))) AS bk
         |  FROM (SELECT $idCol, $labelPred AS __lp, list_filter(
         |          string_split(${Sql.normalizeText(textCol)}, ' '), x -> x <> '') AS t
         |        FROM documents WHERE $textCol IS NOT NULL))""".stripMargin
    val w0 = s"hw0 AS MATERIALIZED (SELECT list_transform(range(0, ${D + 1}), x -> 0.0) AS w)"
    val roundCtes = (1 to rounds).flatMap { r =>
      val prev = s"hw${r - 1}"
      Seq(
        s"""hm$r AS MATERIALIZED (
           |  SELECT y, bk, (${sig(z("w"))} - y) AS margin
           |  FROM hfeats, $prev w)""".stripMargin,
        s"""hg$r AS MATERIALIZED (
           |  SELECT b,
           |    sum(CASE WHEN b = -1 THEN CAST(floor(margin * $qS + 0.5) AS BIGINT)
           |        ELSE CAST(floor((margin * $xS) * $qS + 0.5) AS BIGINT) END) AS g,
           |    count(*) AS c
           |  FROM (SELECT margin, unnest(list_prepend(-1, bk)) AS b FROM hm$r)
           |  GROUP BY b)""".stripMargin,
        s"""hw$r AS MATERIALIZED (
           |  SELECT list_transform(range(1, ${D + 2}),
           |    k -> w.w[k] - ${fmt(lr)} * (CAST(gl.gl[k] AS DOUBLE) / (CAST(n.n AS DOUBLE) * $qS))) AS w
           |  FROM $prev w,
           |    (SELECT list(coalesce(g.g, 0) ORDER BY r.j) AS gl
           |     FROM range(-1, $D) r(j) LEFT JOIN hg$r g ON g.b = r.j) gl,
           |    (SELECT c AS n FROM hg$r WHERE b = -1) n)""".stripMargin)
    }
    val wf = s"hw$rounds"
    val scoreE = s"CAST(floor(${sig(z("w"))} * $qS + 0.5) AS BIGINT) / $qS"
    s"""WITH ${(Seq(feats, w0) ++ roundCtes).mkString(",\n")}
       |SELECT id AS $idCol, CAST(y AS BIGINT) AS y,
       |  $scoreE AS score,
       |  CAST(CASE WHEN $scoreE >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM hfeats, $wf w ORDER BY id""".stripMargin
  }
}
