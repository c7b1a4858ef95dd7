package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport

/** Single-pass per-column profiler: counts, nulls, exact distincts,
  * typed min/max rendered as strings. */
class ProfileSpec extends AnyFunSuite with SparkTestSupport {

  test("profile: nulls counted, distinct excludes null, min/max are typed not lexicographic") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (2L, "b"), (10L, "a"), (null, "b"), (2L, null), (100L, "c")
    ).toDF("num", "str")
    val out = Profile.profile(df, Seq("num", "str"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet === Set("num", "str"))
    val num = out("num")
    assert(num.getAs[Long]("n_rows") === 5L)
    assert(num.getAs[Long]("n_nulls") === 1L)
    assert(num.getAs[Long]("n_distinct") === 3L) // 2, 10, 100 — null excluded
    // numeric min/max, not lexicographic ("10" < "2" would be the wrong answer)
    assert(num.getAs[String]("min_v") === "2")
    assert(num.getAs[String]("max_v") === "100")
    val str = out("str")
    assert(str.getAs[Long]("n_nulls") === 1L)
    assert(str.getAs[Long]("n_distinct") === 3L)
    assert(str.getAs[String]("min_v") === "a" && str.getAs[String]("max_v") === "c")
  }

  test("profile: all statistics compute in one scan of the table") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profile.profile(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // one source scan feeding an Expand — not one scan per column
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("Expand"), s"multi-distinct must plan as a single Expand:\n$plan")
  }
}
