package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw documents whose HASHED-n-gram bag looks
  * like a target distribution. Both feature distributions are
  * multinomials over the same D hash buckets as the t62 classifier
  * ([[HashedClassifier.buckets]] — word uni+bigrams of the normalized
  * text, md5-first-4-hex mod D), so the verified bucket kernel and its
  * DuckDB twin are reused unchanged. The reference engine has no data
  * selection at all (it is a clustering pipeline, SURVEY §0); this is
  * part of the commissioned training-data-pipeline surface.
  *
  * Per-document importance weight = log p̂_target(doc) − log p̂_raw(doc)
  * = Σ_occurrences λ[b], with Laplace-smoothed bucket probabilities
  * λ[b] = ln((c_t[b]+1)/(T_t+D)) − ln((c_r[b]+1)/(T_r+D)). Documents
  * with weight above a threshold are "selected" (the paper resamples
  * with Gumbel noise; the deterministic threshold form keeps the
  * operator reproducible and the oracle exact).
  *
  * Scale shape: fitting is ONE partial+final aggregation of (bucket,
  * is-target) int pairs into ≤ D rows — only those reach the driver
  * (gram strings die inside the per-row hash kernel; text never
  * shuffles). Scoring is SHUFFLE-FREE: a pure row map folding λ over
  * the doc's sorted occurrence buckets ([[graft.expressions.HashedOps
  * .hashedZ]] codegen kernel, λ riding as a plan reference object),
  * then a row-local threshold — no join, no window, no global rank.
  * At 100 TB both passes stream; nothing table-proportional crosses
  * the driver.
  *
  * Bit-portability: the fold runs left-to-right from 0 over the SAME
  * sorted bucket list in both engines with x = 1.0 (exact multiply);
  * λ itself is ln() of identical rationals, so cross-engine deltas are
  * ≤ a few ulp per term — absorbed by the 4-dp round (+1e-9 nudge,
  * t55/t15 precedent) applied BEFORE the threshold compare, so the
  * selected flag derives from the already-rounded weight.
  */
object Dsir {

  /** Hash buckets — shared with [[HashedClassifier]] so the oracle's
    * verified bucket twin is reused. (The paper uses 10k buckets; D is
    * a free parameter — the registered query keeps t62's 64.) */
  val D: Int = HashedClassifier.D

  /** The narrow per-doc feature table (id, t, bk): the hash kernel
    * runs ONCE here; fit and scoring both read these rows (text dies
    * in the kernel — only ids, flags and int buckets survive). */
  def features(docs: DataFrame, text: Column, id: Column,
      targetPred: Column): DataFrame =
    docs.filter(text.isNotNull)
      .select(id.as("id"), targetPred.cast("int").as("t"),
        HashedClassifier.buckets(text).as("bk"))

  /** Fit the per-bucket log-likelihood ratios λ (length D): one
    * aggregation over (bucket, is-target) occurrence pairs, ≤ D rows
    * collected. Buckets unseen in the corpus get the pure-smoothing
    * ratio ln(1/(T_t+D)) − ln(1/(T_r+D)). */
  def fitLogRatios(docs: DataFrame, text: Column, targetPred: Column): Array[Double] =
    fitFromFeatures(features(docs, text, lit(0L), targetPred))

  /** [[fitLogRatios]] over a prebuilt feature table. */
  def fitFromFeatures(feat: DataFrame): Array[Double] = {
    val rows = feat
      .select(col("t"), explode(col("bk")).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"), sum(col("t")).as("ct"))
      .collect()
    val cr = new Array[Long](D)
    val ct = new Array[Long](D)
    rows.foreach { r =>
      cr(r.getInt(0)) = r.getLong(1)
      ct(r.getInt(0)) = r.getLong(2)
    }
    val tr = cr.sum
    val tt = ct.sum
    Array.tabulate(D)(b =>
      math.log((ct(b) + 1.0) / (tt + D.toDouble)) -
        math.log((cr(b) + 1.0) / (tr + D.toDouble)))
  }

  /** Score every document: (id, dsir_weight rounded 4 dp, selected).
    * λ rides as a plan literal; the fold is one codegen call per row. */
  def score(docs: DataFrame, text: Column, id: Column,
      lam: Array[Double], threshold: Double): DataFrame =
    scoreFeatures(features(docs, text, id, lit(false)), lam, threshold)

  /** [[score]] over a prebuilt feature table — a pure row map. */
  def scoreFeatures(feat: DataFrame, lam: Array[Double],
      threshold: Double): DataFrame = {
    val z = graft.expressions.HashedOps.hashedZ(col("bk"), 0.0 +: lam, 1.0)
    feat
      .select(col("id"), round(z + lit(1e-9), 4).as("dsir_weight"))
      .withColumn("selected", col("dsir_weight") > lit(threshold))
  }

  /** The full DuckDB replay: bucket features (t62's verified twin),
    * the two count tables, λ, the per-doc fold, threshold. */
  def oracleSql(textCol: String, targetPred: String, idCol: String,
      threshold: Double): String = {
    import graft.functions.TextFunctions.Sql
    s"""WITH dsf AS MATERIALIZED (
       |  SELECT $idCol AS id,
       |    CASE WHEN __tp THEN 1 ELSE 0 END AS t,
       |    list_sort(list_transform(
       |      tk || list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1]),
       |      g -> CAST(CAST(('0x' || substr(md5(g), 1, 4)) AS BIGINT) % $D AS INTEGER))) AS bk
       |  FROM (SELECT $idCol, $targetPred AS __tp, list_filter(
       |          string_split(${Sql.normalizeText(textCol)}, ' '), x -> x <> '') AS tk
       |        FROM documents WHERE $textCol IS NOT NULL)),
       |dsc AS MATERIALIZED (
       |  SELECT b, count(*) AS cr, sum(t) AS ct
       |  FROM (SELECT t, unnest(bk) AS b FROM dsf) GROUP BY b),
       |dst AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM dsc),
       |dsl AS MATERIALIZED (
       |  SELECT list(
       |    ln((coalesce(c.ct, 0) + 1.0) / (t.tt + $D.0)) -
       |    ln((coalesce(c.cr, 0) + 1.0) / (t.tr + $D.0))
       |    ORDER BY r.b) AS lam
       |  FROM range(0, $D) r(b) LEFT JOIN dsc c ON c.b = r.b CROSS JOIN dst t)
       |SELECT id AS doc_id,
       |  round(list_reduce(list_prepend(0.0,
       |    list_transform(bk, b -> l.lam[b + 1] * 1.0)), (a, x) -> a + x)
       |    + 1e-9, 4) AS dsir_weight,
       |  (round(list_reduce(list_prepend(0.0,
       |    list_transform(bk, b -> l.lam[b + 1] * 1.0)), (a, x) -> a + x)
       |    + 1e-9, 4) > $threshold) AS selected
       |FROM dsf, dsl l
       |ORDER BY doc_id""".stripMargin
  }
}
