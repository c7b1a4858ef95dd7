package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: which keys were ADDED, REMOVED, or CHANGED
  * between two versions of a table — the drift audit every replicated /
  * incrementally-maintained 100 TB table eventually needs (did the
  * downstream copy diverge? did the backfill touch exactly the rows it
  * claimed?).
  *
  * Scale design: neither side's payload columns ever reach the shuffle.
  * Each snapshot is projected to `(keys, xxhash64(compare columns))` at
  * the scan — a ~16-byte row regardless of table width — and the
  * full-outer join runs on those fingerprints. A wide-row compare would
  * shuffle both tables whole; this shuffles two key+hash columns and
  * reads only `keys ++ compare` from parquet (column pruning, gated in
  * PlanQualitySpec).
  *
  * Status semantics per key: `removed` (present only in `a`), `added`
  * (present only in `b`), `changed` (both present, fingerprints differ),
  * `same` otherwise. Callers wanting the drift set filter
  * `status != 'same'` — Catalyst pushes that filter below the project,
  * and `same` rows die in the join output without ever being collected.
  *
  * Preconditions: `keys` must be unique and non-NULL in each snapshot
  * (a NULL key never equi-joins, so it would always report as
  * added+removed; duplicate keys would cross-multiply in the join).
  * The fingerprint compare inherits xxhash64's collision bound: a
  * changed row is mislabeled `same` with probability ~2^-64 per key —
  * the standard trade accepted by every hash-based reconciler; pass the
  * compare columns themselves as keys to force exact comparison of a
  * suspect subset. NULL arrangements are disambiguated explicitly
  * (each column hashes alongside its isNull flag), so a value moving
  * between columns via NULLs is always `changed`, never `same`.
  */
object TableDiff {

  /** Per-key diff of two snapshots. Output: `keys ++ (status)`, one row
    * per key present in either side. */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "TableDiff: at least one key column required")
    require(compare.nonEmpty, "TableDiff: at least one compare column required")
    require(!keys.exists(Set("__fp_a", "__fp_b")),
      "TableDiff: key columns collide with internal fingerprint names")

    // xxhash64 SKIPS null children (the running hash passes through
    // unchanged), so hashing the bare columns would make
    // (NULL, 'x') and ('x', NULL) collide deterministically — a
    // changed row labeled `same` every run, not a 2^-64 accident.
    // Interleaving each column with its isNull flag (0/1, never null)
    // disambiguates every null arrangement: rows differing only in
    // null positions fold different flag sequences.
    def fingerprinted(df: DataFrame, fpName: String): DataFrame =
      df.select(keys.map(col) :+
        xxhash64(compare.flatMap(c =>
          Seq(col(c).isNull.cast("int"), col(c))): _*).as(fpName): _*)

    val fa = fingerprinted(a, "__fp_a")
    val fb = fingerprinted(b, "__fp_b")
    fa.join(fb, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__fp_b").isNull, lit("removed"))
          .when(col("__fp_a").isNull, lit("added"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .otherwise(lit("same")).as("status"): _*)
  }

  /** One row per status with its key count — the dashboard/alert shape
    * (a zero-row drift set and a 10^9-row one render the same here). */
  def summary(a: DataFrame, b: DataFrame, keys: Seq[String], compare: Seq[String]): DataFrame =
    diff(a, b, keys, compare)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))

  /** Convenience: the non-`same` rows only. */
  def drift(a: DataFrame, b: DataFrame, keys: Seq[String], compare: Seq[String]): DataFrame =
    diff(a, b, keys, compare).filter(col("status") =!= "same")
}
