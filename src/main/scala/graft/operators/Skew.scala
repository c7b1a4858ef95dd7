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

  /** Salted equi-join for HOT KEYS — the shuffle-join skew killer for
    * the case AQE's split can't fully fix and a broadcast can't reach:
    * the probe side's key domain is tiny/hot (a handful of keys would
    * land on a handful of reducers), and the build side is too large
    * to broadcast. The probe side gains a deterministic salt
    * `pmod(saltSource, buckets)` (pass a uniformly-distributed column
    * — a row id; NEVER rand(), which breaks retry/replay determinism);
    * the build side replicates each row across ALL `buckets` salts; the
    * join keys become (key, salt), so one hot key spreads over
    * `buckets` reducers. Row-identical to the plain join (spec + j03's
    * oracle); cost is the build side × buckets, the standard trade.
    * A NULL saltSource lands deterministically in bucket 0 (the row
    * must still join — dropping it would break row-identity).
    * The build side is hinted `shuffle_hash` — forcing the shuffled
    * plan this operator exists to fix (a broadcastable build side
    * should just broadcast instead of salting).
    *
    * Join condition: `largeKey === smallKey` plus salt equality; key
    * columns keep their names (pick distinct names on the two inputs,
    * the house join convention). Output: large columns then small
    * columns, salt dropped. */
  def saltedJoin(large: DataFrame, largeKey: Column, saltSource: Column,
      small: DataFrame, smallKey: Column, buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"salt buckets must be positive: $buckets")
    // the salt column is added to BOTH sides and dropped by name at the
    // end — an input that already carries the name would be silently
    // overwritten on the probe side and stripped from the output, so
    // refuse it loudly instead
    require(!large.columns.contains("__graft_salt") && !small.columns.contains("__graft_salt"),
      "saltedJoin: inputs must not already contain a __graft_salt column " +
        "(it would be overwritten and dropped); rename it before joining")
    val salted = large.withColumn("__graft_salt",
      coalesce(pmod(saltSource, lit(buckets)).cast("int"), lit(0)))
    val replicated = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated.hint("shuffle_hash"),
        largeKey === smallKey && salted("__graft_salt") === replicated("__graft_salt"))
      .drop("__graft_salt")
  }
}
