package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed by the join key
  * join WITHOUT a shuffle — the pre-partitioning strategy for repeated
  * large-table joins at 100 TB (pay one write-time shuffle, join free
  * forever after). */
class BucketingSpec extends AnyFunSuite with SparkTestSupport {

  test("join of two tables bucketed on the key runs with zero Exchange") {
    import spark.implicits._
    // warehouse dir is a static conf, set in SparkTestSession
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("okey", "oval")
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    (1 to 5000).map(i => (i.toLong % 1000 + 1, i * 1.0)).toDF("okey", "qty")
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    // force the non-broadcast path so the bucketed co-location (not a
    // broadcast) is what eliminates the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === 5000)

      // sanity: the same join over unbucketed data DOES shuffle
      val plain = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("okey", "oval")
        .join((1 to 5000).map(i => (i.toLong % 1000 + 1, i * 1.0)).toDF("okey", "qty")
          .repartition(7), "okey")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
