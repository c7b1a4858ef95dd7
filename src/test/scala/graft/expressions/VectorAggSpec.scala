package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** [[VectorSum]] — element-wise vector sum as a partial+final custom
  * aggregate: grouped and global sums vs a local reference, NULL
  * skipping, ragged-length fail-fast, partition-independence of the
  * merge, and the SQL registration. */
class VectorAggSpec extends AnyFunSuite with SparkTestSupport {

  private def df(rows: Seq[(Int, Seq[Double])], parts: Int) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("g", "v").repartition(parts)
  }

  test("grouped vec_sum matches the local element-wise sum") {
    val rows = (0 until 97).map(i => (i % 3, Seq(i.toDouble, 2.0 * i, -i.toDouble)))
    val got = df(rows, 7).groupBy("g").agg(VectorAgg.vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> Seq.tabulate(3)(t => rs.map(_._2(t)).sum)
    }
    assert(got.keySet === want.keySet)
    for (g <- want.keySet; t <- 0 until 3)
      assert(math.abs(got(g)(t) - want(g)(t)) < 1e-9, s"g=$g pos=$t")
  }

  test("partition count does not change the result (merge correctness)") {
    val rows = (0 until 50).map(i => (0, Seq(i * 0.5, 1.0)))
    val expected = Seq(rows.map(_._2(0)).sum, 50.0)
    for (parts <- Seq(1, 3, 16)) {
      val s = df(rows, parts).agg(VectorAgg.vecSum(col("v")).as("s"))
        .head().getSeq[Double](0)
      assert(s === expected, s"parts=$parts")
    }
  }

  test("NULL vectors are skipped; an all-NULL group evaluates to NULL") {
    import spark.implicits._
    val d = Seq(
      (0, Some(Seq(1.0, 2.0))), (0, None), (0, Some(Seq(3.0, 4.0))),
      (1, None), (1, None))
      .toDF("g", "v").repartition(3)
    val out = d.groupBy("g").agg(VectorAgg.vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Double](1))).toMap
    assert(out(0) === Some(Seq(4.0, 6.0)))
    assert(out(1) === None)
  }

  test("ragged vector lengths fail fast, not silently mis-sum") {
    import spark.implicits._
    val d = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
      .coalesce(1)
    val e = intercept[SparkException] {
      d.groupBy("g").agg(VectorAgg.vecSum(col("v")).as("s")).collect()
    }
    assert(e.getMessage.contains("vec_sum") ||
      Option(e.getCause).exists(_.getMessage.contains("vec_sum")))
  }

  test("SQL registration: vec_sum usable from spark.sql") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq((0, Seq(1.5, -2.0)), (0, Seq(0.5, 3.0)), (1, Seq(7.0, 7.0)))
      .toDF("g", "v").createOrReplaceTempView("vec_sum_in")
    val got = spark.sql(
      "SELECT g, vec_sum(v) AS s FROM vec_sum_in GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[Double](1))
    assert(got(0) === Seq(2.0, 1.0))
    assert(got(1) === Seq(7.0, 7.0))
  }
}
