package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 (SCD2) maintenance — the
  * versioned-history shape every warehouse keeps for its dimensions:
  * one row per (key, consecutive-attribute-run) with
  * `[valid_from, valid_to)` validity, `is_current` on the open row, and
  * a per-key `version_no`.
  *
  * Two entry points:
  *   - [[fromChangeLog]] — initial build from a full change log;
  *   - [[applyIncrement]] — incremental merge of a batch of NEW changes
  *     into an existing SCD2 table WITHOUT re-reading the log.
  *
  * Scale design: the build is ONE hash shuffle on the key — the change
  * flag, the version numbering, the per-version aggregate, and the
  * valid_to chain are all windows/aggregates over that same
  * key-clustering (Catalyst plans zero additional Exchanges: a
  * HashPartitioning(key) satisfies the (key, version) aggregation's
  * ClusteredDistribution, and the post-agg lead() re-sorts within
  * partitions). The merge touches ONLY keys present in the increment
  * (semi/anti joins against the increment's distinct-key set — at
  * 100 TB a broadcastable set, since an increment is small relative to
  * the dimension); untouched rows stream through column-untouched, and
  * closed history rows of touched keys are never recomputed either —
  * only each touched key's CURRENT row is re-opened.
  *
  * `last_seen_ts` (max event ts folded into a version) exists so the
  * merge can refuse out-of-order increments EXACTLY: an increment row
  * at or before a key's last seen event would have to rewrite collapsed
  * history that is no longer recoverable from the dimension, so
  * [[applyIncrement]] fails loud instead of silently producing a
  * history that differs from the full-log rebuild.
  */
object Scd2 {

  /** Build the SCD2 table from a change log.
    *
    * @param log      change events
    * @param key      dimension key column (BIGINT/string — anything hashable)
    * @param ts       event-time column (ordering within key)
    * @param tieBreak unique column breaking equal-`ts` ties (event id) —
    *                 without it, equal-ts orders differ across engines/runs
    * @param attrs    tracked attribute columns; CONSECUTIVE runs of
    *                 null-safe-equal attrs collapse into one version
    *
    * Output: key, version_no (1-based per key), attrs…, valid_from,
    * last_seen_ts, valid_to (NULL = open), is_current.
    */
  def fromChangeLog(log: DataFrame, key: String, ts: String, tieBreak: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2: at least one tracked attribute")
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    // null-safe "any attr changed vs previous event" — the first event of
    // a key has lag()=NULL which <=> reports as distinct from any
    // non-NULL attr, correctly opening version 1; an all-NULL attr row
    // following another all-NULL row correctly extends the run
    val changed = attrs
      .map(a => !(lag(col(a), 1).over(byKey) <=> col(a)))
      .reduce(_ || _)
    // a key's FIRST event must open version 1 even when its attrs are
    // all NULL (lag's missing-row NULL <=> a NULL value is TRUE, so
    // `changed` alone would miss it) — detect the first row by the
    // never-NULL tieBreak's lag instead
    val firstOfKey = lag(col(tieBreak), 1).over(byKey).isNull
    val verNo = sum(when(firstOfKey || changed, 1L).otherwise(0L))
      .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val numbered = log.select(
      (col(key) +: col(ts) +: col(tieBreak) +: attrs.map(col)): _*)
      .withColumn("version_no", verNo)
    val aggs = attrs.map(a => min(col(a)).as(a)) ++ Seq(
      min(col(ts)).as("valid_from"),
      max(col(ts)).as("last_seen_ts"))
    val perVersion = numbered
      .groupBy(col(key), col("version_no"))
      .agg(aggs.head, aggs.tail: _*)
    val chain = Window.partitionBy(col(key)).orderBy(col("version_no"))
    perVersion
      .withColumn("valid_to", lead(col("valid_from"), 1).over(chain))
      .withColumn("is_current", col("valid_to").isNull)
      .select(
        (col(key) +: col("version_no") +: attrs.map(col)) ++
          Seq(col("valid_from"), col("last_seen_ts"), col("valid_to"),
            col("is_current")): _*)
  }

  /** Temporal (point-in-time) lookup against the SCD2 table — the
    * canonical consumer: enrich each fact row with the dimension
    * attributes VALID AT its timestamp, i.e. the version with
    * `valid_from <= ts < valid_to` (open current row covers the tail).
    *
    * Implemented on [[AsOfJoin.backward]] rather than an interval
    * join: versions are contiguous per key, so "the interval covering
    * ts" IS "the latest version starting at or before ts" — ONE
    * shuffle by key, never the O(fact × versions-per-key) pair blowup.
    * The version_no tie-break resolves same-instant supersessions
    * (a zero-width [t, t) version loses to the version that replaced
    * it at t — exactly the interval semantics, since no ts lies in a
    * zero-width interval). Facts before a key's first version (or for
    * unknown keys) get NULL payload.
    *
    * @param payload dim columns to carry, renamed as given (e.g.
    *                `Seq("version_no" -> "version_no", "attr" -> "attr_at_ts")`)
    */
  def lookup(fact: DataFrame, dim: DataFrame, key: String, factTs: String,
      payload: Seq[(String, String)]): DataFrame =
    AsOfJoin.backward(fact, dim, key,
      leftTs = factTs, rightTs = "valid_from",
      rightPayload = payload, rightTieBreak = "version_no")

  /** Merge a batch of new change events into an existing SCD2 table.
    *
    * Result is IDENTICAL to `fromChangeLog(originalLog ∪ updates)`
    * (the Scd2Spec equivalence property, and q42's oracle), provided
    * every update row is strictly newer than its key's `last_seen_ts` —
    * violated rows would have to rewrite collapsed history, so the call
    * fails loud (one narrow count over the increment's keys, not a
    * scan of the dimension).
    *
    * Mechanics: each touched key's CURRENT row is replayed as two
    * synthetic boundary events (valid_from and last_seen_ts — they
    * collapse back into one version carrying the original span) plus
    * the key's updates; [[fromChangeLog]] rebuilds that tail and the
    * version numbers re-base onto the old current row's `version_no`.
    * Closed history rows and untouched keys pass through by column
    * identity.
    */
  def applyIncrement(dim: DataFrame, updates: DataFrame, key: String,
      ts: String, tieBreak: String, attrs: Seq[String]): DataFrame = {
    val outCols = dim.columns.toSeq
    val touchedKeys = updates.select(col(key)).distinct()

    val current = dim.filter(col("is_current"))
      .join(touchedKeys, Seq(key), "left_semi")

    // ONE fused validation job (this runs per micro-batch in the s11
    // streaming fold — two separate driver-blocking actions would
    // double the per-batch latency floor):
    //  - NULL keys cannot take the incremental path: the semi/anti key
    //    routing is ANSI-join-based (NULL matches nothing), so a
    //    NULL-keyed dim row would pass through "untouched" while a
    //    NULL-keyed update rebuilt from scratch — two version chains
    //    for one key. (fromChangeLog itself handles NULL keys fine.)
    //    NULL-keyed updates survive the left_outer below unmatched.
    //  - out-of-order refusal: an update at or before its key's
    //    last_seen_ts cannot merge exactly — collapsed same-attr
    //    events inside the current version are gone from the dimension.
    val viol = updates
      .join(current.select(col(key), col("last_seen_ts")), Seq(key), "left_outer")
      .agg(
        sum(when(col(key).isNull, 1L).otherwise(0L)).as("nullKeys"),
        sum(when(col(ts) <= col("last_seen_ts"), 1L).otherwise(0L)).as("late"))
      .head()
    val (nullKeys, late) =
      (if (viol.isNullAt(0)) 0L else viol.getLong(0),
        if (viol.isNullAt(1)) 0L else viol.getLong(1))
    require(nullKeys == 0L,
      s"scd2 merge: $nullKeys NULL-keyed update row(s) — NULL keys cannot be " +
        "merged incrementally (join-based key routing); rebuild with fromChangeLog")
    require(late == 0L,
      s"scd2 merge: $late update row(s) at or before their key's last_seen_ts " +
        "— out-of-order increments need a full-log rebuild")

    // synthetic replay of the current version: two boundary events with
    // the version's attrs; equal boundaries (single-event versions)
    // still collapse to one version. tieBreak -1/-2 orders them before
    // any real update at the same ts — impossible anyway under the
    // late-row refusal, but deterministic regardless.
    val tbType = updates.schema(tieBreak).dataType
    val replayCurrent = current.select(
      (col(key) +: col("valid_from").as(ts) +:
        lit(-2L).cast(tbType).as(tieBreak) +: attrs.map(col)): _*)
      .union(current.select(
        (col(key) +: col("last_seen_ts").as(ts) +:
          lit(-1L).cast(tbType).as(tieBreak) +: attrs.map(col)): _*))
    val miniLog = replayCurrent.union(
      updates.select((col(key) +: col(ts) +: col(tieBreak) +: attrs.map(col)): _*))

    // rebuilt tail, re-based onto the old current version_no (new keys
    // have no current row → base 1)
    val base = current.select(col(key), col("version_no").as("__scd2_base"))
    val rebuilt = fromChangeLog(miniLog, key, ts, tieBreak, attrs)
      .join(base, Seq(key), "left_outer")
      .withColumn("version_no",
        col("version_no") + coalesce(col("__scd2_base"), lit(1L)) - 1L)
      .select(outCols.map(col): _*)

    val untouchedRows = dim.join(touchedKeys, Seq(key), "left_anti")
    val closedTouched = dim.filter(!col("is_current"))
      .join(touchedKeys, Seq(key), "left_semi")

    untouchedRows.select(outCols.map(col): _*)
      .union(closedTouched.select(outCols.map(col): _*))
      .union(rebuilt)
  }
}
