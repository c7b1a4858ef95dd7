package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style snapshot refresh (upsert) — the write side of an
  * incremental pipeline: yesterday's corpus snapshot + today's (deduped,
  * gated) increment → the new snapshot. Spark OSS parquet has no MERGE
  * statement; the relational equivalent is ONE full-outer join on the
  * key:
  *
  *   - key in both        → the update wins ('U')
  *   - key only in updates → insert ('I')
  *   - key only in snapshot → carry over ('K')
  *
  * Scale shape: snapshots live in the bucketed layout (q30 —
  * `bucketBy(n, key)`), so the join reads the 100 TB snapshot IN PLACE
  * and only the increment side shuffles (into the snapshot's bucket
  * count). An updates table a fraction of the snapshot's size costs a
  * fraction of a shuffle — the property the q31 plan gate pins
  * (exactly one Exchange below the join, on the updates side).
  */
object Upsert {

  /** Apply `updates` to `snapshot` (same schema — names, order, AND
    * types — unique `key`). Output: every resulting row plus an
    * `action` tag (U/I/K).
    *
    * Row-level "update wins": when a key matches, the ENTIRE update row
    * replaces the snapshot row — including non-key columns that are
    * legitimately NULL in the update (they overwrite, they do not fall
    * back to the stale snapshot value).
    *
    * The matched-side gate is a PRESENCE MARKER on the update side,
    * not the key's nullness: a NULL-keyed update row never joins
    * (ANSI: NULL = NULL is not true) but is still an update-side row,
    * so it surfaces as an INSERT with its payload intact — exactly
    * what SQL MERGE's WHEN NOT MATCHED arm does — instead of
    * degenerating into an all-NULL row tagged 'K' (the key-nullness
    * gate's failure mode). */
  def upsert(snapshot: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(snapshot.columns.sameElements(updates.columns),
      s"upsert: schema mismatch (${snapshot.columns.mkString(",")} vs ${updates.columns.mkString(",")})")
    require(snapshot.schema.map(_.dataType) == updates.schema.map(_.dataType),
      s"upsert: column type mismatch (${snapshot.schema.map(_.dataType).mkString(",")} " +
        s"vs ${updates.schema.map(_.dataType).mkString(",")})")
    require(!snapshot.columns.contains("__u") && !snapshot.columns.contains("__s"),
      "upsert: __u/__s are reserved marker column names")
    val s = snapshot.withColumn("__s", lit(1)).as("s")
    val u = updates.withColumn("__u", lit(1)).as("u")
    val merged = s.join(u, col(s"s.$key") === col(s"u.$key"), "full_outer")
    merged.select(
      snapshot.columns.toIndexedSeq.map(c =>
        when(col("u.__u").isNotNull, col(s"u.$c"))
          .otherwise(col(s"s.$c")).as(c)) :+
        when(col("u.__u").isNotNull && col("s.__s").isNotNull, "U")
          .when(col("u.__u").isNotNull, "I")
          .otherwise("K").as("action"): _*)
  }
}
