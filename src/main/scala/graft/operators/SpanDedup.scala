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

  /** Position-ordered k-gram hash rows of a corpus slice:
    * (id, start0, gh) — the one text-touching pass every SpanDedup
    * entry point starts from. In the streaming shape (s22) this runs
    * per micro-batch on arrival; everything downstream is hash-only. */
  def gramsOf(docs: DataFrame, text: Column, id: Column, k: Int): DataFrame =
    docs
      .select(id.as("id"), posexplode(TextHash.shingleHashes(text, k)))
      .toDF("id", "start0", "gh")

  /** Persisted gram index of an existing corpus: one row per distinct
    * gram hash with mergeable provenance — (gh, min_id, max_id, n_occ).
    * min/max/sum all fold associatively, so a later increment merges
    * into the stored table with one aggregate (the t25/t35 incremental
    * contract); at scale the table is written bucketed by gh so only
    * the increment shuffles at serve time. */
  def gramIndex(docs: DataFrame, text: Column, id: Column,
      k: Int = 8): DataFrame =
    gramsOf(docs, text, id, k)
      .groupBy(col("gh"))
      .agg(min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        count(lit(1)).as("n_occ"))

  /** Fold an increment's grams into a stored [[gramIndex]] — the
    * maintenance half: union + re-aggregate, every column an
    * associative merge, so any batch slicing lands on the same table
    * as a full rebuild. */
  def mergeGramIndex(index: DataFrame, increment: DataFrame): DataFrame =
    index.unionByName(increment)
      .groupBy(col("gh"))
      .agg(min(col("min_id")).as("min_id"), max(col("max_id")).as("max_id"),
        sum(col("n_occ")).as("n_occ"))

  /** Duplicated spans of an INCREMENT against (stored corpus ∪
    * increment): a new doc's gram qualifies iff it exists in the
    * stored [[gramIndex]] (some old document carries it) OR at least
    * two distinct new documents carry it — exactly the gram groups
    * [[duplicateSpans]] over the full corpus would flag, restricted to
    * the new docs (the oracle claim: full-recompute equality). The old
    * corpus's text is NEVER re-scanned; the index side shuffles bare
    * (gh) rows and the increment's windows + join share one gh
    * partitioning. */
  def spansAgainstIndex(newDocs: DataFrame, text: Column, id: Column,
      index: DataFrame, k: Int = 8): DataFrame =
    spansFromGrams(gramsOf(newDocs, text, id, k), index, k)

  /** Detection tail of [[spansAgainstIndex]] over already-extracted
    * gram rows — the serve step of the streaming shape (s22), where
    * micro-batches fold their [[gramsOf]] output into narrow state and
    * the spans assemble once at snapshot time. */
  def spansFromGrams(grams: DataFrame, index: DataFrame, k: Int): DataFrame = {
    val byGram = Window.partitionBy(col("gh"))
    val hits = grams
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .join(index.select(col("gh"), lit(true).as("in_index")), Seq("gh"), "left")
      .filter(col("in_index").isNotNull || col("d0") =!= col("d1"))
      .select(col("id"), col("start0"))
    mergedSpans(hits, k)
  }

  /** CHARACTER-granularity gram rows: (id, start0, gh) — one 64-bit
    * rolling hash per L-char window (stride 1) of the NORMALIZED text.
    * Normalization happens here so every char-level entry point and
    * the SQL oracle share one position space ([a-z0-9 ] ASCII — char
    * == code point == DuckDB substring units). */
  def charGramsOf(docs: DataFrame, text: Column, id: Column, L: Int): DataFrame =
    docs
      .select(id.as("id"),
        posexplode(TextHash.charShingleHashes(TextHash.normalizeText(text), L)))
      .toDF("id", "start0", "gh")

  /** Exact-substring dedup at CHARACTER granularity — the
    * suffix-array-ExactSubstr rung below [[duplicateSpans]]' k-token
    * grid (Lee et al. 2022's "Deduplicating Training Data Makes
    * Language Models Better" removes verbatim duplicates of ≥ 50
    * CHARS; a 50-char licence line or quote can hide entirely inside
    * 9 tokens and never trip a k=10 token gram). Any substring of
    * length ≥ L shared by two documents contains a shared L-char
    * window at every interior offset, so stride-1 window hits +
    * interval merge recover exactly the MAXIMAL shared substrings —
    * the same guarantee the suffix array gives, in two shuffles and
    * one text pass instead of a global sort: positions never leave
    * hash space, and the merge is [[mergedSpans]] verbatim with k = L
    * (char offsets instead of token offsets). Output:
    * (id, span_start, span_end, n_grams) — half-open char offsets into
    * the normalized text, n_grams = qualifying window starts inside
    * the span (span length = span_end − span_start ≥ L always). */
  def duplicateCharSpans(docs: DataFrame, text: Column, id: Column,
      L: Int = 40): DataFrame = {
    val byGram = Window.partitionBy(col("gh"))
    val hits = charGramsOf(docs, text, id, L)
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .filter(col("d0") =!= col("d1"))
      .select(col("id"), col("start0"))
    mergedSpans(hits, L)
  }

  /** Persisted char-gram index — [[gramIndex]] at char granularity,
    * same mergeable (gh, min_id, max_id, n_occ) contract, so
    * [[mergeGramIndex]] folds char increments unchanged. */
  def charGramIndex(docs: DataFrame, text: Column, id: Column,
      L: Int = 40): DataFrame =
    charGramsOf(docs, text, id, L)
      .groupBy(col("gh"))
      .agg(min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        count(lit(1)).as("n_occ"))

  /** Char-level spans of an INCREMENT against (stored corpus ∪
    * increment) — [[spansAgainstIndex]]' contract at char granularity:
    * the stored corpus's text is never re-scanned, a new doc's window
    * qualifies iff the index holds it or ≥ 2 new docs carry it. */
  def charSpansAgainstIndex(newDocs: DataFrame, text: Column, id: Column,
      index: DataFrame, L: Int = 40): DataFrame =
    spansFromGrams(charGramsOf(newDocs, text, id, L), index, L)

  /** The cut at CHARACTER granularity — [[cutDuplicateSpans]]' rule on
    * [[duplicateCharSpans]]' detection: every occurrence of a
    * cross-document L-char window EXCEPT the globally first
    * (lexicographic-min (id, start0) in the window group) becomes a
    * cut interval; merged intervals are removed from the NORMALIZED
    * text and the patch re-emitted as
    * (id, n_spans_cut, n_chars_before, n_chars_after, clean_text) —
    * only affected documents appear (the t50 patch contract: the
    * corpus is never rewritten; the patch is proportional to the
    * duplication). The reconstruction is a per-row fold over the
    * dimension-sized span list (substring concatenation — spans per
    * doc are few, so the interpreted HOF is not a corpus-hot loop),
    * after broadcasting the per-doc interval lists onto a second
    * corpus scan. Text never shuffles. */
  def cutDuplicateCharSpans(docs: DataFrame, text: Column, id: Column,
      L: Int = 40): DataFrame = {
    val byGram = Window.partitionBy(col("gh"))
    val cuts = charGramsOf(docs, text, id, L)
      .withColumn("cmin", min(struct(col("id"), col("start0"))).over(byGram))
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .filter(col("d0") =!= col("d1") &&
        !(col("cmin.id") === col("id") && col("cmin.start0") === col("start0")))
      .select(col("id"), col("start0"))
    val spans = mergedSpans(cuts, L)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
          .as("spans"),
        count(lit(1)).as("n_spans_cut"))
    docs
      .select(id.as("id"), TextHash.normalizeText(text).as("nt"))
      .join(broadcast(spans), Seq("id"))
      // fold over the DISJOINT ascending spans: emit the gap before
      // each span, then the tail after the last one (half-open char
      // offsets into nt; substring is 1-based)
      .withColumn("clean_text", expr(
        """concat(
          |  aggregate(spans, named_struct('pos', 0L, 'acc', ''),
          |    (st, sp) -> named_struct(
          |      'pos', sp.span_end,
          |      'acc', concat(st.acc,
          |        substring(nt, cast(st.pos + 1 as int),
          |          cast(sp.span_start - st.pos as int)))),
          |    st -> st.acc),
          |  substring(nt, cast(element_at(spans, -1).span_end + 1 as int),
          |    length(nt)))""".stripMargin))
      .select(col("id"), col("n_spans_cut"),
        length(col("nt")).cast("long").as("n_chars_before"),
        length(col("clean_text")).cast("long").as("n_chars_after"),
        col("clean_text"))
  }

  /** Maximal merged spans of k-token grams shared verbatim with at
    * least one other document: (id, span_start, span_end, n_grams) —
    * token offsets in normalized-token space, half-open
    * `[span_start, span_end)`, `n_grams` = duplicated gram starts
    * inside the span. Overlapping or abutting gram windows merge into
    * one span. Documents with no cross-doc gram emit nothing. */
  def duplicateSpans(docs: DataFrame, text: Column, id: Column,
      k: Int = 8): DataFrame = {
    val grams = gramsOf(docs, text, id, k)
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
    mergedSpans(hits, k)
  }

  /** Interval merge of k-wide gram windows: (id, start0) hit rows →
    * maximal merged (id, span_start, span_end, n_grams) spans. A window
    * starts a new run iff it begins past the furthest end seen so far
    * (> prevmax + k; == abuts and merges); the running sum of
    * run-starts numbers the runs. The (id, run) aggregation reuses the
    * window's id-hash partitioning — no second exchange. */
  private def mergedSpans(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("id")).orderBy(col("start0"))
    val runs = hits
      .withColumn("prevmax",
        max(col("start0")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("run",
        sum(when(col("prevmax").isNull ||
            col("start0") > col("prevmax") + k, 1L).otherwise(0L))
          .over(byDoc))
    runs.groupBy(col("id"), col("run"))
      .agg(min(col("start0")).cast("long").as("span_start"),
        (max(col("start0")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_grams"))
  }

  /** The cut on top of the detection: every occurrence of a
    * cross-document k-gram EXCEPT the globally first one (lexicographic
    * min (id, start0) within the gram group) is removed from its
    * document, and the cleaned text re-emitted in normalized-token
    * space. One copy of every duplicated run survives somewhere in the
    * corpus — the classic "keep one occurrence" exact-substring dedup
    * training pipelines apply after detection.
    *
    * Output is a PATCH TABLE — only documents that lost at least one
    * span appear (id, n_spans_cut, n_tokens_before, n_tokens_after,
    * clean_text); consumers overlay it on the corpus the way the
    * tombstone/delete families (t36, v22, t44) overlay theirs. At
    * 100 TB that is the only sane contract: the corpus is never
    * rewritten, and the patch is proportional to the duplication, not
    * the data.
    *
    * Shape: the gram pass and canonical-occurrence selection ride the
    * same one-scan window plan as [[duplicateSpans]] (hashes only —
    * document text never enters an exchange); the per-doc cut interval
    * lists are dimension-sized and BROADCAST back onto a second corpus
    * scan, where the cut itself is a per-row codegen higher-order
    * filter (token index ∉ any cut span) — no UDF, no explode of the
    * token stream, no text shuffle. For a corpus where duplication is
    * pervasive rather than sparse (patch ~ corpus), drop the broadcast
    * hint and let AQE pick the shuffle join — the rest of the plan is
    * unchanged. */
  def cutDuplicateSpans(docs: DataFrame, text: Column, id: Column,
      k: Int = 8): DataFrame = {
    val grams = gramsOf(docs, text, id, k)
    // canonical occurrence = lexicographic min (id, start0) in the gram
    // group — a struct min, so no ordered window (and no long-packing
    // overflow at any id range); cross-document test is the same
    // min≠max trick as duplicateSpans
    val byGram = Window.partitionBy(col("gh"))
    val cuts = grams
      .withColumn("cmin", min(struct(col("id"), col("start0"))).over(byGram))
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .filter(col("d0") =!= col("d1") &&
        !(col("cmin.id") === col("id") && col("cmin.start0") === col("start0")))
      .select(col("id"), col("start0"))
    applyCuts(docs, text, id, cuts, k)
  }

  /** The cut applied to an INCREMENT against a stored [[gramIndex]] —
    * stored-corpus-wins semantics: the published corpus never changes,
    * so EVERY increment occurrence of an indexed gram is cut (the old
    * corpus already holds a copy), and among grams the index has never
    * seen, [[cutDuplicateSpans]]' rule applies within the increment
    * (all but the lexicographic-min occurrence cut). Equal to the full
    * recompute under old-docs-first canonical ordering, restricted to
    * the increment — and to the plain full recompute whenever old ids
    * precede new ids (the append-only corpus). The stored corpus's
    * TEXT is never re-scanned; only the increment runs the gram kernel
    * and the patch overlay. */
  def cutSpansAgainstIndex(newDocs: DataFrame, text: Column, id: Column,
      index: DataFrame, k: Int = 8): DataFrame = {
    val grams = gramsOf(newDocs, text, id, k)
    val byGram = Window.partitionBy(col("gh"))
    val cuts = grams
      .withColumn("cmin", min(struct(col("id"), col("start0"))).over(byGram))
      .withColumn("d0", min(col("id")).over(byGram))
      .withColumn("d1", max(col("id")).over(byGram))
      .join(index.select(col("gh"), lit(true).as("in_index")), Seq("gh"), "left")
      .filter(col("in_index").isNotNull ||
        (col("d0") =!= col("d1") &&
          !(col("cmin.id") === col("id") && col("cmin.start0") === col("start0"))))
      .select(col("id"), col("start0"))
    applyCuts(newDocs, text, id, cuts, k)
  }

  /** Patch tail shared by the cut entry points: merge the cut windows
    * into per-doc interval lists, broadcast them onto a second scan of
    * `docs`, and re-emit the cleaned text. The cut itself is a per-row
    * codegen higher-order filter (token index ∉ any cut span) — no
    * UDF, no explode of the token stream, no text shuffle. */
  private def applyCuts(docs: DataFrame, text: Column, id: Column,
      cuts: DataFrame, k: Int): DataFrame = {
    // merged cut intervals, collapsed to one small row per affected doc
    val spans = mergedSpans(cuts, k)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"),
        count(lit(1)).as("n_spans_cut"))
    // second corpus scan + broadcast overlay; the cut is a per-row
    // filter-by-index over the normalized tokens
    val toks = filter(split(TextHash.normalizeText(text), " "),
      t => t =!= lit(""))
    val kept = filter(col("toks"), (_, i) =>
      !exists(col("spans"), s =>
        i.cast("long") >= s.getField("span_start") &&
          i.cast("long") < s.getField("span_end")))
    docs
      .select(id.as("id"), toks.as("toks"))
      .join(broadcast(spans), Seq("id"))
      .withColumn("kept", kept)
      .select(col("id"), col("n_spans_cut"),
        size(col("toks")).cast("long").as("n_tokens_before"),
        size(col("kept")).cast("long").as("n_tokens_after"),
        array_join(col("kept"), " ").as("clean_text"))
  }
}
