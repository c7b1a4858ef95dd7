package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate an
  * ingest pipeline runs before publishing a table (the Deequ/dbt-test
  * shape, engine-native).
  *
  * Three constraint classes, grouped by what they cost at 100 TB:
  *
  *   - [[rowCheck]] (not-null, ranges, value domains) and
  *     [[uniqueKey]]: ALL of them evaluate in ONE aggregate over ONE
  *     scan (q32's profiler discipline) — a row check is a
  *     conditional count, a unique-key check is
  *     `count(*) - count(DISTINCT key struct)`, and Catalyst fuses
  *     every one of them into the same partial+final aggregation. N
  *     constraints never cost N scans (plan-gated).
  *   - [[foreignKey]]: referential integrity needs the other table, so
  *     each FK is a LEFT ANTI join — against dimension key sets these
  *     broadcast, so the fact side still reads once per FK and never
  *     shuffles (plan-gated). The anti-join violation count treats a
  *     NULL fact key as NON-violating (SQL FK semantics: NULL
  *     references nothing); pair with a not-null rowCheck when NULLs
  *     are themselves defects.
  *
  * [[report]] returns one row per constraint — (check_name,
  * violations, passed) — so the gate composes downstream (alert on
  * `passed = false`, block the publish, write the audit row).
  */
object Expectations {

  sealed trait Check { def name: String }

  /** `violation` TRUE ⇒ the row violates; NULL counts as NOT violating
    * (state the NULL case explicitly — e.g. `col.isNull` for not-null
    * checks). */
  final case class RowCheck(name: String, violation: Column) extends Check

  /** Duplicate rows beyond the first per key tuple are violations. */
  final case class UniqueKey(name: String, cols: Seq[String]) extends Check

  /** Rows whose non-NULL key tuple has no match in `ref` violate. */
  final case class ForeignKey(name: String, keys: Seq[String],
      ref: DataFrame, refKeys: Seq[String]) extends Check

  def rowCheck(name: String, violation: Column): Check = RowCheck(name, violation)
  def uniqueKey(name: String, cols: String*): Check = UniqueKey(name, cols)
  def foreignKey(name: String, keys: Seq[String], ref: DataFrame,
      refKeys: Seq[String]): Check = ForeignKey(name, keys, ref, refKeys)

  /** Row-level verdicts — the QUARANTINE side of a streaming gate:
    * every row failing at least one check, tagged with the
    * comma-joined names (declaration order) of the checks it failed.
    * Clean rows are `df` minus these — derivable with the same
    * predicates, no join.
    *
    * Row checks only: uniqueness and FK verdicts depend on rows
    * outside the one being judged, so they are NOT batch-invariant —
    * a streaming gate evaluating them per micro-batch would pass rows
    * a whole-table gate rejects. Refused loudly rather than silently
    * weakened. Because row checks are per-row, the quarantine set is
    * provably invariant to micro-batch slicing: the streamed union of
    * per-batch quarantines equals the batch gate over the full table
    * (s13's oracle IS that claim). NULL predicate results count as
    * NOT violating, matching [[report]]. */
  def quarantine(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: at least one check")
    val rcs = checks.map {
      case RowCheck(n, v) => (n, v)
      case c => throw new IllegalArgumentException(
        s"quarantine: only row checks are batch-invariant; '${c.name}' is not")
    }
    // concat_ws skips NULLs (identically in DuckDB — oracle-portable),
    // so each unfired check simply vanishes from the tag
    val failed = concat_ws(",",
      rcs.map { case (n, v) => when(coalesce(v, lit(false)), lit(n)) }: _*)
    df.withColumn("failed_checks", failed)
      .filter(col("failed_checks") =!= "")
  }

  /** Evaluate every check against `df` → (check_name, violations,
    * passed), one row per check, in the order given. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: at least one check")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"expectations: duplicate check names in ${names.mkString(", ")}")

    // one fused aggregate for every scan-local check
    val scanLocal: Seq[(String, Column)] = checks.collect {
      case RowCheck(n, v) =>
        n -> sum(when(v, 1L).otherwise(0L)).as(n)
      case UniqueKey(n, cols) =>
        n -> (count(lit(1)) -
          countDistinct(struct(cols.map(col): _*))).as(n)
    }
    val fusedOpt = if (scanLocal.isEmpty) None else Some {
      val aggs = scanLocal.map(_._2)
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the 1×N aggregate row into N (check_name, violations) rows
      val pairs = scanLocal.map { case (n, _) =>
        s"'${n.replace("'", "''")}', `$n`" }.mkString(", ")
      one.select(expr(s"stack(${scanLocal.size}, $pairs) AS (check_name, violations)"))
    }

    val fkReports: Seq[DataFrame] = checks.collect {
      case ForeignKey(n, keys, ref, refKeys) =>
        val probe = df.select(keys.map(col): _*)
          .filter(keys.map(col(_).isNotNull).reduce(_ && _))
        val dim = broadcast(ref.select(refKeys.map(col): _*).distinct())
        val cond = keys.zip(refKeys)
          .map { case (k, r) => probe(k) === dim(r) }.reduce(_ && _)
        probe.join(dim, cond, "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"), col("violations"))
    }

    val parts = fusedOpt.toSeq ++ fkReports
    val unioned = parts.reduce(_ unionByName _)
    // restore declaration order (the union interleaves classes)
    val order = names.zipWithIndex.toMap
    val orderCol = names.foldLeft(lit(Int.MaxValue)) { (acc, n) =>
      when(col("check_name") === n, lit(order(n))).otherwise(acc)
    }
    unioned
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"), orderCol.as("__ord"))
      .orderBy(col("__ord"))
      .drop("__ord")
  }
}
