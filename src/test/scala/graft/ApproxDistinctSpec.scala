package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends AnyFunSuite with SparkTestSupport {

  test("approx_count_distinct within 5% of exact on skewed cardinalities") {
    import spark.implicits._
    val df = (1 to 50000).map(i => (s"g${i % 3}", (i % (500 + (i % 3) * 700)).toLong))
      .toDF("g", "uid")
    val rows = df.groupBy($"g")
      .agg(approx_count_distinct($"uid").as("a"), countDistinct($"uid").as("e"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("a"), r.getAs[Long]("e"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"group ${r.getString(0)}: approx=$a exact=$e")
    }
  }
}
