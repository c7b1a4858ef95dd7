package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins — the training-data staple for feature
  * lookups ("the feature value as of the example's timestamp") that
  * plain Spark lacks as a primitive. The full merge_asof surface:
  *
  *  - [[backward]]: latest right row with `rightTs <= leftTs`
  *  - [[forward]]:  earliest right row with `rightTs >= leftTs`
  *  - both with an optional TOLERANCE: a match farther than the given
  *    interval from the probe timestamp nullifies (a stale feature is
  *    worse than a missing one)
  *
  * Spark-first formulation: tag both sides, UNION, and take a running
  * `last(ignoreNulls)` (backward) or `first(ignoreNulls)` (forward) of
  * the right payload over a window partitioned by key and ordered by
  * (ts, side, tie-break). This costs exactly ONE shuffle (by key) + an
  * in-partition sort — it never materializes the O(left × right-per-key)
  * pairs a range-join would, and it inherits AQE's skew handling for
  * hot keys. At equal timestamps the right row is visible to the left
  * row in BOTH directions (inclusive semantics): backward sorts right
  * before left (side 0 < 1), forward sorts right after left (1 > 0).
  * Duplicate right timestamps break ties by `rightTieBreak` — backward
  * takes the LAST ("latest state at or before t"), forward the FIRST
  * ("earliest state at or after t").
  */
object AsOfJoin {

  /** @param left          probe side
    * @param right         state side (rows looked up as-of)
    * @param key           equi-join key column name (same name both sides)
    * @param leftTs        left event-time column name
    * @param rightTs       right event-time column name
    * @param rightPayload  right columns to carry to the output (renamed
    *                      as given); NULL when no right row qualifies
    * @param rightTieBreak column ordering duplicate right timestamps
    * @param tolerance     optional SQL interval (e.g. "INTERVAL 2 DAY"):
    *                      a match farther than this from the probe
    *                      timestamp yields NULL payload instead
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)],
      rightTieBreak: String,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, rightPayload, rightTieBreak,
      forward = false, tolerance)

  /** [[backward]] mirrored: the EARLIEST right row at or after the
    * probe timestamp (merge_asof direction='forward'). */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)],
      rightTieBreak: String,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, rightPayload, rightTieBreak,
      forward = true, tolerance)

  private def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)],
      rightTieBreak: String,
      forward: Boolean, tolerance: Option[String]): DataFrame = {
    val leftCols = left.columns
    // the matched right timestamp rides the payload struct so the
    // tolerance bound can compare it after the window picks the match
    val payloadWithTs = rightPayload :+ (rightTs -> "__asof_ts")
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(leftSide).as("__side"), lit(null).cast("long").as("__tie"),
      struct(leftCols.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(structType(right, payloadWithTs)).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(rightSide).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
      lit(null).cast(structType(left, leftCols.map(c => c -> c).toSeq)).as("__l"),
      struct(payloadWithTs.map { case (c, a) => col(c).as(a) }: _*).as("__r"))
    val base = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
    val pick =
      if (forward)
        first(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val withMatch = l
      .unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
      .withColumn("__asof", pick)
      .filter(col("__side") === lit(leftSide))
    val bounded = tolerance.fold(withMatch) { tol =>
      val ok =
        if (forward) col("__asof.__asof_ts") <= col("__ts") + expr(tol)
        else col("__asof.__asof_ts") >= col("__ts") - expr(tol)
      withMatch.withColumn("__asof", when(ok, col("__asof")))
    }
    bounded.select(leftCols.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
      rightPayload.map { case (_, a) => col(s"__asof.$a").as(a) }: _*)
  }

  private def structType(df: DataFrame, cols: Seq[(String, String)]) =
    org.apache.spark.sql.types.StructType(cols.map { case (c, a) =>
      df.schema(c).copy(name = a)
    })
}
