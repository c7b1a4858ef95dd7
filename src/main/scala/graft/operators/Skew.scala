package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: salt the grouping key so one hot key's
  * rows spread over `saltBuckets` reducers, partially aggregate per
  * (key, salt), then combine partials per key. Results are identical to
  * the direct groupBy — only the shuffle layout changes: without
  * salting, a key holding 10% of 100 TB funnels 10 TB through ONE
  * reducer; salted, the same key costs two small shuffles. (AQE's
  * skew-join splitting covers joins; aggregation skew still needs the
  * salt.) Spark's map-side partial aggregation already absorbs modest
  * skew — this is for keys too hot for a single final-stage reducer. */
object Skew {

  /** count + sum(valueCol) per key, two-phase salted. */
  def saltedCountSum(df: DataFrame, keyCol: Column, valueCol: Column,
      saltBuckets: Int = 16): DataFrame =
    df.select(keyCol.as("key"), valueCol.as("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))
}
