package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join: for each left row, the latest
  * right row with the same key and `rightTs <= leftTs` — the
  * training-data staple for feature lookups ("the feature value as of
  * the example's timestamp") that plain Spark lacks as a primitive.
  *
  * Spark-first formulation: tag both sides, UNION, and take a running
  * `last(ignoreNulls)` of the right payload over a window partitioned by
  * key and ordered by (ts, side, tie-break). This costs exactly ONE
  * shuffle (by key) + an in-partition sort — it never materializes the
  * O(left × right-per-key) pairs a range-join would, and it inherits
  * AQE's skew handling for hot keys. At equal timestamps the right row
  * sorts first (side 0 < side 1), so exact-time matches are included;
  * duplicate right timestamps break ties by `rightTieBreak` (the later
  * one wins, matching "latest state at or before t").
  */
object AsOfJoin {

  /** @param left          probe side
    * @param right         state side (rows looked up as-of)
    * @param key           equi-join key column name (same name both sides)
    * @param leftTs        left event-time column name
    * @param rightTs       right event-time column name
    * @param rightPayload  right columns to carry to the output (renamed
    *                      as given); NULL when no right row precedes
    * @param rightTieBreak column ordering duplicate right timestamps
    *                      (last wins)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast("long").as("__tie"),
      struct(leftCols.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(structType(right, rightPayload)).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
      lit(null).cast(structType(left, leftCols.map(c => c -> c).toSeq)).as("__l"),
      struct(rightPayload.map { case (c, a) => col(c).as(a) }: _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map { case (_, a) => col(s"__asof.$a").as(a) }: _*)
  }

  private def structType(df: DataFrame, cols: Seq[(String, String)]) =
    org.apache.spark.sql.types.StructType(cols.map { case (c, a) =>
      df.schema(c).copy(name = a)
    })
}
