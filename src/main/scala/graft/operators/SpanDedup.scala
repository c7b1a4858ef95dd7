package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TextHash

/** Cross-document EXACT substring detection — the span-level rung of
  * the dedup ladder. Document-level near-dup (t09/t21) removes whole
  * documents; this finds the verbatim k-token RUNS a document shares
  * with any OTHER document (boilerplate headers, licence blocks,
  * quoted passages), the unit "deduplicating training data" pipelines
  * remove so models don't memorize repeated spans that survive
  * document-level filtering.
  *
  * Shape, built for the 100 TB corpus — ONE corpus scan, two shuffles:
  *  1. one fused text pass per document ([[TextHash.shingleHashes]] —
  *     position-ordered 64-bit k-gram hashes, so every shuffle carries
  *     (id, pos, hash), never gram text; token bytes fan out k× in
  *     hash form only),
  *  2. cross-document detection as min/max-id WINDOW functions over
  *     the gram hash (`min(id) <> max(id)` — no distinct-count, and
  *     crucially no groupBy+self-join back onto the gram table, which
  *     would re-run the text kernel over the whole corpus as the
  *     probe side's second scan),
  *  3. per-document interval merge of the k-wide windows — a window
  *     function over (id, pos); the final (id, run) aggregation reuses
  *     the window's hash partitioning, so the merge costs one shuffle.
  *
  * Intra-document repeats alone do NOT qualify (that's repetition
  * scoring, t18): a gram counts only when at least two distinct
  * documents carry it — but every occurrence inside a qualifying
  * document is then marked, including its intra-doc repeats.
  */
object SpanDedup {

  /** Maximal merged spans of k-token grams shared verbatim with at
    * least one other document: (id, span_start, span_end, n_grams) —
    * token offsets in normalized-token space, half-open
    * `[span_start, span_end)`, `n_grams` = duplicated gram starts
    * inside the span. Overlapping or abutting gram windows merge into
    * one span. Documents with no cross-doc gram emit nothing. */
  def duplicateSpans(docs: DataFrame, text: Column, id: Column,
      k: Int = 8): DataFrame = {
    val grams = docs
      .select(id.as("id"), posexplode(TextHash.shingleHashes(text, k)))
      .toDF("id", "start0", "gh")
    // a gram is cross-document iff two distinct ids carry it — min≠max
    // as window functions over the hash, so the gram table is consumed
    // ONCE (a groupBy+join-back would scan the corpus twice); gram
    // groups are tiny outside pathological boilerplate, and WindowExec
    // spills if one isn't
    val byGram = Window.partitionBy(col("gh"))
    val hits = grams
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .filter(col("d0") =!= col("d1"))
      .select(col("id"), col("start0"))
    // classic interval merge: a window starts a new run iff it begins
    // past the furthest end seen so far (> prevmax + k; == abuts and
    // merges); the running sum of run-starts numbers the runs
    val byDoc = Window.partitionBy(col("id")).orderBy(col("start0"))
    val runs = hits
      .withColumn("prevmax",
        max(col("start0")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("run",
        sum(when(col("prevmax").isNull ||
            col("start0") > col("prevmax") + k, 1L).otherwise(0L))
          .over(byDoc))
    // grouping on (id, run) is satisfied by the window's id-hash
    // partitioning — no second exchange
    runs.groupBy(col("id"), col("run"))
      .agg(min(col("start0")).cast("long").as("span_start"),
        (max(col("start0")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_grams"))
  }
}
