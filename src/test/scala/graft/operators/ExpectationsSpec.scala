package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class ExpectationsSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._
  import Expectations._

  private lazy val df = Seq(
    (Some(1L), Some(10), "A", Some(100L)),
    (Some(2L), Some(20), "B", Some(200L)),
    (Some(2L), Some(20), "A", Some(999L)), // dup key (2,20); FK miss 999
    (None, Some(30), "C", Some(100L)), // null id; bad flag
    (Some(4L), None, "A", None)) // null qty and null FK (FK: not a violation)
    .toDF("id", "qty", "flag", "ref_id")

  private lazy val refs = Seq(100L, 200L, 300L).toDF("r_id")

  private def run(): Map[String, (Long, Boolean)] =
    report(df, Seq(
      rowCheck("id_not_null", $"id".isNull),
      rowCheck("qty_range", !$"qty".between(1, 25)),
      rowCheck("flag_domain", !$"flag".isin("A", "B")),
      uniqueKey("key_unique", "id", "qty"),
      foreignKey("fk_ref", Seq("ref_id"), refs, Seq("r_id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("every constraint class counts exactly; NULLs follow SQL semantics") {
    val m = run()
    assert(m("id_not_null") === (1L, false))
    // qty=30 violates; qty=NULL does NOT (NULL comparison is not TRUE)
    assert(m("qty_range") === (1L, false))
    assert(m("flag_domain") === (1L, false))
    // exactly one duplicate beyond the first for (2,20)
    assert(m("key_unique") === (1L, false))
    // ref 999 missing; NULL ref key is NOT an FK violation
    assert(m("fk_ref") === (1L, false))
  }

  test("report preserves declaration order and marks clean checks passed") {
    val out = report(df, Seq(
      rowCheck("z_first", $"id".isNull && $"qty".isNull), // impossible → clean
      rowCheck("a_second", $"id".isNull)))
      .collect()
    assert(out.map(_.getString(0)).toSeq === Seq("z_first", "a_second"))
    assert(out(0).getLong(1) === 0L && out(0).getBoolean(2))
    assert(out(1).getLong(1) === 1L && !out(1).getBoolean(2))
  }

  test("all scan-local checks fuse into one aggregate over one scan") {
    val path = java.nio.file.Files.createTempDirectory("graft-exp").toString + "/t"
    df.write.parquet(path)
    val fromDisk = spark.read.parquet(path)
    val rep = report(fromDisk, Seq(
      rowCheck("c1", $"id".isNull),
      rowCheck("c2", !$"qty".between(1, 25)),
      rowCheck("c3", !$"flag".isin("A", "B")),
      uniqueKey("c4", "id", "qty")))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"4 scan-local checks must cost ONE scan, saw $scans:\n$plan")
  }

  test("duplicate names and empty check lists are refused") {
    intercept[IllegalArgumentException] {
      report(df, Seq(rowCheck("x", $"id".isNull), rowCheck("x", $"qty".isNull)))
    }
    intercept[IllegalArgumentException] { report(df, Nil) }
  }

  private def gateChecks = Seq(
    rowCheck("id_not_null", $"id".isNull),
    rowCheck("qty_range", !$"qty".between(1, 25)),
    rowCheck("flag_domain", !$"flag".isin("A", "B")))

  test("quarantine tags each failing row with every failed check, declaration order") {
    val q = quarantine(df, gateChecks)
      .collect().map(r => (r.getAs[Any]("qty"), r.getAs[String]("failed_checks")))
    // only the (None, 30, "C") row violates — and it fails all three;
    // qty=NULL is NOT a range violation (NULL predicate = not violating)
    assert(q.toSeq === Seq((30, "id_not_null,qty_range,flag_domain")))
  }

  test("quarantine + clean is a partition of the input (no row lost or duplicated)") {
    val quarantined = quarantine(df, gateChecks).drop("failed_checks")
    val clean = df.exceptAll(quarantined)
    assert(quarantined.count() + clean.count() === df.count())
    assert(clean.unionAll(quarantined).exceptAll(df).isEmpty)
  }

  test("quarantine is batch-invariant: sliced union equals the whole-table gate") {
    val whole = quarantine(df, gateChecks).collect().toSet
    val sliced = quarantine(df.filter($"flag" === "A"), gateChecks)
      .unionAll(quarantine(df.filter($"flag" =!= "A"), gateChecks))
      .collect().toSet
    assert(sliced === whole)
  }

  test("quarantine refuses non-row checks loudly") {
    val e = intercept[IllegalArgumentException] {
      quarantine(df, Seq(rowCheck("ok", $"id".isNull), uniqueKey("u", "id")))
    }
    assert(e.getMessage.contains("batch-invariant"))
    intercept[IllegalArgumentException] {
      quarantine(df, Seq(foreignKey("fk", Seq("ref_id"), refs, Seq("r_id"))))
    }
    intercept[IllegalArgumentException] { quarantine(df, Nil) }
  }
}
