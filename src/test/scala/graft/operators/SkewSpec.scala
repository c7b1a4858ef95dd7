package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class SkewSpec extends AnyFunSuite with SparkTestSupport {

  test("saltedCountSum equals direct groupBy on skewed data") {
    import spark.implicits._
    // key 1 holds 90% of rows (the hot key)
    val rows = (1 to 900).map(i => (1L, i * 0.5)) ++ (1 to 100).map(i => (i % 7 + 2L, 1.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, col("k"), col("v"), saltBuckets = 4)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n"), math.round(r.getAs[Double]("total") * 100) / 100.0)).toMap
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n"), math.round(r.getAs[Double]("total") * 100) / 100.0)).toMap
    assert(salted === direct)
  }

  test("salting actually spreads a hot key over multiple partial groups") {
    import spark.implicits._
    val df = (1 to 1000).map(_ => (42L, 1.0)).toDF("k", "v").repartition(8)
    val partials = df.select(col("k"), col("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(4)).as("salt"))
      .groupBy(col("k"), col("salt")).count()
    assert(partials.count() > 1) // the hot key split across salt buckets
  }
}
