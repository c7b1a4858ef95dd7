package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verify's oracle_sql.json merge-preserve contract (round-12 fix for
  * the round-11 regression: a piecewise run — SPARK_GRAFT_VERIFY_ONLY,
  * or any JVM where the gng family never trained — rewrote the file
  * from scratch and silently dropped the 17 dump-time trained-model
  * oracles, downgrading hash-verified queries to rows-only in the
  * closing gate). */
class VerifySpec extends AnyFunSuite {

  test("parseStringMap round-trips the escapes Verify itself writes") {
    val m = Map(
      "q1" -> "SELECT 1",
      "q2" -> "line1\nline2\ttab \"quoted\" back\\slash",
      "q3" -> "ctlchar",
      "q4" -> "")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    assert(Verify.parseStringMap(json) === m)
    assert(Verify.parseStringMap("{}") === Map.empty)
    assert(Verify.parseStringMap("""{ "a" : "b" }""") === Map("a" -> "b"))
    intercept[Exception](Verify.parseStringMap("""{"a": 1}"""))
  }

  test("mergeOracles preserves not-re-run oracles and drops regressions/stale keys") {
    val prev = Map(
      "gng_purity" -> "SELECT /*dump-time*/ 1", // not re-run → must survive
      "q01" -> "SELECT old",                    // re-run → fresh wins
      "t99_regressed" -> "SELECT gone",         // re-run, now un-oracled → drop
      "deleted_query" -> "SELECT stale")        // no longer in the contract → drop
    val fresh = Map("q01" -> "SELECT new", "t05" -> "SELECT t5")
    val ran = Set("q01", "t05", "t99_regressed")
    val known = Set("gng_purity", "q01", "t05", "t99_regressed")
    val merged = Verify.mergeOracles(prev, fresh, ran, known)
    assert(merged === Map(
      "gng_purity" -> "SELECT /*dump-time*/ 1",
      "q01" -> "SELECT new",
      "t05" -> "SELECT t5"))
  }

  test("round-11 shape: piecewise run keeps the trained-model oracle family") {
    // A subset run where the gng family did NOT execute: fresh lacks all
    // dump-time oracles, but prev carries them — every one must survive.
    val family = Seq("gng_assignments", "gng_edges", "gng_prototypes",
      "v06_ivf", "v10_pq")
    val prev = family.map(n => n -> s"SELECT '$n'").toMap + ("s01" -> "SELECT old")
    val fresh = Map("s01" -> "SELECT new")
    val merged = Verify.mergeOracles(prev, fresh, ran = Set("s01"),
      known = prev.keySet)
    assert(merged.size === family.size + 1)
    family.foreach(n => assert(merged(n) === s"SELECT '$n'"))
    assert(merged("s01") === "SELECT new")
  }
}
