package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.TextHash
import graft.expressions.TextHashImpl.langStopwords
import graft.functions.TextFunctions

/** Distributed trained quality/language classifier — the
  * "fasttext-style filter" stage of a training-data pipeline: learn a
  * linear model over the engine's own cheap text features (the t06
  * quality components + stopword densities), then score every document
  * in one codegen pass. The hand-tuned t06 heuristic becomes a LEARNED
  * weighting.
  *
  * Scale shape, per training round: ONE partial+final aggregation over
  * the (cached, ~40 bytes/doc) feature table — d+1 integer gradient
  * sums and a count reach the driver, nothing else. Scoring is a pure
  * row map + the output sort. Both survive 1000 executors unchanged.
  *
  * Bit-portability is designed in, so the DuckDB oracle can replay the
  * ENTIRE training statically (no dump-time inlining — stronger than
  * the v19/t42 precedent):
  *  - the link is the SOFTSIGN sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|) —
  *    only +,−,×,÷,abs, all IEEE-754 correctly-rounded, unlike exp();
  *    two engines computing the same expression shape get the same
  *    bits,
  *  - per-document gradient contributions quantize to 1e-6 INTEGERS
  *    (floor(g·1e6 + 0.5) — the Math.round contract used across the
  *    engine), so the cross-document sum is exact integer arithmetic:
  *    order-independent under any partitioning, any engine,
  *  - every feature is a ratio/min of exact integers (division is
  *    correctly rounded), and z folds left-to-right in both engines.
  * Weights therefore never need rounding: they are bit-identical
  * functions of the corpus in both engines.
  */
object TextClassifier {

  /** Gradient-quantization grid: contributions round to 1e-6. */
  private val Q = 1000000.0

  /** Feature columns over a text column — x1..x4 in [0,1]: length
    * ramp, non-punctuation fraction, English stopword density,
    * duplicate-token fraction (the t06 quality components + the t18
    * repetition signal). Each is the exact-integer-ratio form whose
    * DuckDB twin is bit-identical. */
  def features(text: Column): Seq[Column] = {
    // one fused scan for (chars, punct, toks) — the qualityScore
    // counts with RE2-\s / code-point semantics, so the regex twins in
    // the oracle stay bit-exact (a Java-regex count here would diverge
    // on \x0B and non-BMP code points); the three getItems collapse to
    // one kernel eval under projection-level subexpression elimination
    val qs = TextHash.qualityStats(text)
    val chars = greatest(qs.getItem(0), lit(1.0))
    val punct = qs.getItem(1)
    val toks = greatest(qs.getItem(2), lit(1.0))
    val stopEn = TextHash.stopwordHits(text, 0).cast("double")
    Seq(
      least(chars / 500.0, lit(1.0)),
      lit(1.0) - punct / chars,
      least(stopEn * 10.0 / toks, lit(1.0)),
      TextHash.repetitionStats(text).getItem(0))
  }

  /** σ(z) − y and z = w·x, folded left-to-right — the single
    * expression shape both engines share. */
  private def zOf(ws: Array[Double], xs: Seq[Column]): Column =
    xs.zip(ws.tail).foldLeft(lit(ws.head): Column) {
      case (acc, (x, w)) => acc + x * lit(w)
    }

  private def softsign(z: Column): Column =
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))

  /** Train `rounds` full-batch gradient steps from w = 0. `label` must
    * be 0.0/1.0. Returns the learned weights (bias first). The feature
    * table is computed once and cached — each round is one aggregate
    * over it. */
  def fit(docs: DataFrame, text: Column, label: Column,
      lr: Double = 8.0, rounds: Int = 30): Array[Double] =
    fitFrom(docs, text, label, new Array[Double](features(text).size + 1),
      lr, rounds)

  /** Continue training from stored weights — the warm-start/continual
    * path when the corpus grows: full-batch GD is memoryless beyond
    * its weights, so `fitFrom(fit(a rounds), b rounds)` on the same
    * corpus IS `fit(a+b rounds)`, and refreshing on old∪increment
    * costs only the new rounds, never a from-zero retrain. */
  def fitFrom(docs: DataFrame, text: Column, label: Column,
      init: Array[Double], lr: Double = 8.0, rounds: Int = 30): Array[Double] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val xs = features(text)
    require(init.length == xs.size + 1,
      s"init must have ${xs.size + 1} weights (bias first): ${init.length}")
    val feat = docs
      .filter(text.isNotNull)
      .select((label.cast("double").as("y") +:
        xs.zipWithIndex.map { case (x, i) => x.as(s"x${i + 1}") }): _*)
      .cache()
    try {
      val d = xs.size
      var w = init.clone()
      for (_ <- 1 to rounds) {
        val fxs = (1 to d).map(i => col(s"x$i"))
        val margin = softsign(zOf(w, fxs)) - col("y")
        val grads = (lit(1.0) +: fxs).zipWithIndex.map { case (x, j) =>
          sum(floor(margin * x * lit(Q) + lit(0.5)).cast("long")).as(s"g$j")
        }
        val row = feat.agg(grads.head, (grads.tail :+ count(lit(1)).as("n")): _*)
          .collect().head
        // fail fast on a degenerate corpus: with n = 0 the NULL sums
        // would unbox to 0 and 0.0/0.0 would silently NaN every weight
        require(row.getAs[Long]("n") > 0L,
          "classifier training corpus has no non-null-text rows")
        val n = row.getAs[Long]("n").toDouble
        w = w.indices.map(j =>
          w(j) - lr * (row.getAs[Long](s"g$j").toDouble / (n * Q))).toArray
      }
      w
    } finally { feat.unpersist() }
  }

  /** Score every document under learned weights: (id, y, score, pred)
    * — score is σ(w·x) on the 1e-6 grid (exact both engines), pred the
    * 0.5 threshold. A pure row map over one corpus scan. */
  def score(docs: DataFrame, text: Column, id: Column, label: Column,
      w: Array[Double]): DataFrame = {
    val xs = features(text)
    // zOf's zip would silently DROP mismatched weights (e.g. a model
    // persisted under an older feature set) — refuse instead
    require(w.length == xs.size + 1,
      s"weights must have ${xs.size + 1} entries (bias first): ${w.length}")
    val s = softsign(zOf(w, xs))
    docs
      .filter(text.isNotNull)
      .select(id.as("id"), label.cast("long").as("y"),
        (floor(s * lit(Q) + lit(0.5)).cast("long") / lit(Q)).as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
  }

  /** Precision/recall/F1 sweep over score thresholds — the evaluation
    * stage that decides where to place a filter's cutoff. Scores bin
    * to a 1/50 grid (one partial+final aggregate over the scored
    * corpus), then cumulative-from-the-top window sums over the ≤51
    * bin rows give TP/FP/FN at every occupied threshold: the window
    * runs on dimension-sized data, never the corpus. All divisions are
    * exact-integer ratios (correctly rounded, bit-portable); emitted
    * metrics land on the 1e-6 grid. */
  def prCurve(scored: DataFrame): DataFrame = {
    val bins = scored
      .groupBy(floor(col("score") * lit(50.0)).cast("long").as("bin"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("n"))
    val desc = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def r6(c: Column): Column =
      floor(c * lit(Q) + lit(0.5)).cast("long") / lit(Q)
    val cum = bins
      .withColumn("tp", sum(col("pos")).over(desc))
      .withColumn("npred", sum(col("n")).over(desc))
      .withColumn("tot", sum(col("pos")).over(all))
    val p = col("tp").cast("double") / col("npred").cast("double")
    // tot = 0 (no positive labels anywhere) would make recall 0/0 NaN —
    // Spark's floor(NaN).cast quietly yields 0 while the DuckDB twin's
    // CAST raises, so the degenerate case must be defined: recall 0.0
    val r = when(col("tot") === 0L, 0.0)
      .otherwise(col("tp").cast("double") / col("tot").cast("double"))
    cum.select(
        (col("bin").cast("double") / lit(50.0)).as("thr"),
        col("tp").cast("long").as("tp"),
        (col("npred") - col("tp")).cast("long").as("fp"),
        (col("tot") - col("tp")).cast("long").as("fn"),
        r6(p).as("precision"), r6(r).as("recall"),
        r6(when(p + r === 0.0, 0.0)
          .otherwise(lit(2.0) * p * r / (p + r))).as("f1"))
  }

  /** DuckDB twin of [[prCurve]] over a scored-rows subquery (the t53
    * oracle nests verbatim — the v20/v27 whole-oracle-as-leg
    * precedent). */
  def prCurveOracleSql(scoredSql: String): String = {
    val p = "(CAST(tp AS DOUBLE) / CAST(npred AS DOUBLE))"
    val r = "(CASE WHEN tot = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / CAST(tot AS DOUBLE) END)"
    def r6(e: String) = s"CAST(floor(($e) * ${fmt(Q)} + 0.5) AS BIGINT) / ${fmt(Q)}"
    s"""WITH scored AS MATERIALIZED ($scoredSql),
       |b AS (SELECT CAST(floor(score * 50.0) AS BIGINT) AS bin,
       |        sum(y) AS pos, count(*) AS n FROM scored GROUP BY 1),
       |c AS (SELECT bin,
       |        sum(pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
       |        sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS npred,
       |        sum(pos) OVER () AS tot FROM b)
       |SELECT CAST(bin AS DOUBLE) / 50.0 AS thr,
       |  CAST(tp AS BIGINT) AS tp, CAST(npred - tp AS BIGINT) AS fp,
       |  CAST(tot - tp AS BIGINT) AS fn,
       |  ${r6(p)} AS precision, ${r6(r)} AS recall,
       |  ${r6(s"CASE WHEN $p + $r = 0.0 THEN 0.0 ELSE (2.0 * $p * $r) / ($p + $r) END")} AS f1
       |FROM c ORDER BY thr""".stripMargin
  }

  /** DuckDB twin: the full train-then-score pipeline as ONE static SQL
    * query — feature CTE, one weight CTE per round (cross-joined
    * 1-row tables), final scoring. Textually adjacent to the engine
    * code above so the expression shapes cannot drift. */
  def oracleSql(textCol: String, labelPred: String, idCol: String,
      lr: Double = 8.0, rounds: Int = 30): String =
    trainScoreSql(textCol, labelPred, idCol, lr, Seq(None -> rounds))

  /** DuckDB twin of the warm-start path (t56): `oldRounds` over the
    * docs matching `oldPred`, then `newRounds` continuing from those
    * weights over ALL docs; scoring serves the full corpus. */
  def warmStartOracleSql(textCol: String, labelPred: String, idCol: String,
      oldPred: String, lr: Double = 8.0, oldRounds: Int = 30,
      newRounds: Int = 10): String =
    trainScoreSql(textCol, labelPred, idCol, lr,
      Seq(Some(oldPred) -> oldRounds, None -> newRounds))

  /** Phased train-then-score SQL: one feature CTE per phase (each with
    * an optional extra doc predicate), a continuous chain of weight
    * CTEs across phases, scoring over the LAST phase's corpus. */
  private def trainScoreSql(textCol: String, labelPred: String,
      idCol: String, lr: Double, phases: Seq[(Option[String], Int)]): String = {
    import TextFunctions.Sql
    val d = 4
    val chars = s"CAST(greatest(length($textCol), 1) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all($textCol, '[^a-zA-Z0-9\\s]')) AS DOUBLE)"
    val toks = s"CAST(greatest(${Sql.tokenCount(textCol)}, 1) AS DOUBLE)"
    val stopEn = s"CAST(${Sql.stopwordHits(textCol, langStopwords.head._2)} AS DOUBLE)"
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    // reference, and the weight chain re-references the previous round
    // ~10 times — inlining would blow up the plan (and the parquet
    // reader count) exponentially; materialized, the replay is one
    // small scalar aggregate per round over cached feature sets
    def featsCte(name: String, pred: Option[String]) = {
      val extra = pred.map(p => s" AND ($p)").getOrElse("")
      s"""$name AS MATERIALIZED (SELECT $idCol AS id,
         |  CAST(CASE WHEN $labelPred THEN 1 ELSE 0 END AS DOUBLE) AS y,
         |  least($chars / 500.0, 1.0) AS x1,
         |  1.0 - $punct / $chars AS x2,
         |  least($stopEn * 10.0 / $toks, 1.0) AS x3,
         |  ${Sql.dupTokenFrac(textCol)} AS x4
         |FROM documents WHERE $textCol IS NOT NULL$extra)""".stripMargin
    }
    // z folds left-to-right exactly like zOf; σ is the same softsign
    def z(wRef: String) =
      (1 to d).foldLeft(s"$wRef.w0")((acc, j) => s"($acc + x$j * $wRef.w$j)")
    def sig(e: String) = s"(0.5 + 0.5 * (($e) / (1.0 + abs($e))))"
    val w0 = s"w0 AS MATERIALIZED (SELECT ${(0 to d).map(j => s"0.0 AS w$j").mkString(", ")})"
    val featsCtes = phases.zipWithIndex.map { case ((pred, _), p) =>
      featsCte(s"feats$p", pred)
    }
    var r = 0
    val roundCtes = phases.zipWithIndex.flatMap { case ((_, rounds), p) =>
      (1 to rounds).flatMap { _ =>
        r += 1
        val prev = s"w${r - 1}"
        val margin = s"(${sig(z(prev))} - y)"
        val gs = (0 to d).map { j =>
          val x = if (j == 0) "1.0" else s"x$j"
          s"sum(CAST(floor((($margin * $x) * ${fmt(Q)}) + 0.5) AS BIGINT)) AS g$j"
        }
        Seq(
          s"g$r AS MATERIALIZED (SELECT ${gs.mkString(", ")}, count(*) AS n FROM feats$p, $prev)",
          s"w$r AS MATERIALIZED (SELECT ${(0 to d).map(j =>
            s"$prev.w$j - ${fmt(lr)} * (CAST(g$r.g$j AS DOUBLE) / (CAST(g$r.n AS DOUBLE) * ${fmt(Q)})) AS w$j")
            .mkString(", ")} FROM $prev, g$r)")
      }
    }
    val wf = s"w$r"
    val serve = s"feats${phases.size - 1}"
    s"""WITH ${(featsCtes ++ Seq(w0) ++ roundCtes).mkString(",\n")}
       |SELECT id AS $idCol, CAST(y AS BIGINT) AS y,
       |  CAST(floor(${sig(z(wf))} * ${fmt(Q)} + 0.5) AS BIGINT) / ${fmt(Q)} AS score,
       |  CAST(CASE WHEN CAST(floor(${sig(z(wf))} * ${fmt(Q)} + 0.5) AS BIGINT) / ${fmt(Q)} >= 0.5
       |       THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM $serve, $wf ORDER BY id""".stripMargin
  }

  /** Render a double so DuckDB parses the identical value ("4.0", not
    * "4"). */
  private def fmt(x: Double): String =
    if (x == math.floor(x) && math.abs(x) < 1e15) s"${x.toLong}.0"
    else x.toString
}
