package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench harness's failure-visibility and outlier-re-run contracts
  * (round-7 orders: a broken query must fail LOUDLY, a >2×-vs-baseline
  * measurement must carry its re-run, and the stdout line must parse). */
class BenchSpec extends AnyFunSuite with SparkTestSupport {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("table missing")
  // throws at EXECUTION (the noop write), not at plan build — the case
  // the old harness silently swallowed
  private val lazyBoom: (SparkSession, String) => DataFrame =
    (s, _) => {
      import org.apache.spark.sql.functions._
      s.range(3).toDF("id").select(raise_error(lit("exec-time failure")).as("x"))
    }

  test("a throwing query is recorded as err, not measured as near-zero green") {
    val rs = Bench.measureAll(spark, "unused",
      Seq("good" -> ok, "bad" -> boom, "bad_lazy" -> lazyBoom), reps = 2, Map.empty)
    val byName = rs.map(m => m.name -> m).toMap
    assert(byName("good").err.isEmpty && byName("good").value > 0)
    assert(byName("bad").err.exists(_.contains("table missing")))
    assert(byName("bad_lazy").err.exists(_.contains("exec-time failure")))
    assert(byName("bad").value === -1.0) // never a plausible-looking number
    // failures surface in BOTH artifact lines
    assert(Bench.detailJson(rs, "sf").contains("\"errors\":{\"bad\":"))
    assert(Bench.compactJson(rs, "sf").contains("table missing"))
  }

  test("outlier vs baseline triggers a recorded re-run; normal queries don't re-run") {
    // baseline says "good" used to take 1ns → any real measurement is
    // >2× → the policy must re-measure and keep both rep sets
    val rs = Bench.measureAll(spark, "unused", Seq("good" -> ok), reps = 2,
      Map("good" -> 1e-9))
    assert(rs.head.isOutlier && rs.head.rerunReps.size === 2)
    assert(rs.head.baseline.contains(1e-9))
    val detail = Bench.detailJson(rs, "sf")
    assert(detail.contains("rerun_reps") && detail.contains("baseline"))
    assert(Bench.compactJson(rs, "sf").contains("\"outliers\":{\"good\":"))
    // a generous baseline → no re-run
    val calm = Bench.measureAll(spark, "unused", Seq("good" -> ok), reps = 2,
      Map("good" -> 1e9))
    assert(!calm.head.isOutlier)
    // no baseline at all → no re-run
    val fresh = Bench.measureAll(spark, "unused", Seq("good" -> ok), reps = 2, Map.empty)
    assert(!fresh.head.isOutlier)
  }

  test("both JSON lines parse; compact line stays tail-capture sized") {
    val rs = Bench.measureAll(spark, "unused",
      Seq("a" -> ok, "b" -> ok, "bad" -> boom), reps = 1, Map("a" -> 1e-9))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    for (line <- Seq(Bench.detailJson(rs, "sfX"), Bench.compactJson(rs, "sfX"))) {
      val node = mapper.readTree(line) // throws on malformed JSON
      assert(node.get("metric").asText() === "total")
      assert(node.get("queries").size() === 3)
      assert(node.get("errors").has("bad"))
      assert(node.get("sf").asText() === "sfX")
    }
    // value aggregates only successful queries (bad contributes nothing)
    val total = mapper.readTree(Bench.compactJson(rs, "sfX")).get("value").asDouble()
    assert(total > 0)
    // round-trip through readBaselines: next round compares against this one
    val tmp = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(tmp, Bench.detailJson(rs, "sfX"))
    val base = Bench.readBaselines(tmp.toString, "sfX")
    assert(base.keySet === Set("a", "b", "bad") && base("a") > 0)
    // a baseline from another SF dir must not apply (it would flag the
    // whole suite as outliers)
    assert(Bench.readBaselines(tmp.toString, "sfOther") === Map.empty)
    assert(Bench.readBaselines("/nonexistent/path.json", "sfX") === Map.empty)
  }
}
