package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.SparkTestSupport

class AsOfJoinSpec extends AnyFunSuite with SparkTestSupport {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("backward as-of picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts(5)), (2L, 10L, ts(15)), (3L, 10L, ts(30)),
      (4L, 20L, ts(10)), (5L, 30L, ts(10))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts(0)), (101L, 10L, ts(15)), (102L, 10L, ts(40)),
      (103L, 20L, ts(20)) // after user 20's only event
    ).toDF("state_id", "user_id", "ts")

    val out = AsOfJoin.backward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id", "ts" -> "asof_ts"),
        rightTieBreak = "state_id")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong)))

    assert(out.toSeq === Seq(
      1L -> Some(100L), // ts 5 → latest right at 0
      2L -> Some(101L), // ts 15 → EXACT match included
      3L -> Some(101L), // ts 30 → 15 still latest (40 is future)
      4L -> None,       // user 20: only right row is in the future
      5L -> None))      // user 30: no right rows at all
  }

  test("duplicate right timestamps: the higher tie-break wins") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((200L, 7L, ts(10)), (201L, 7L, ts(10)))
      .toDF("state_id", "user_id", "ts")
    val out = AsOfJoin.backward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"),
        rightTieBreak = "state_id")
      .head()
    assert(out.getAs[Long]("asof_id") === 201L)
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts(5)), (2L, 10L, ts(15)), (3L, 10L, ts(45)),
      (4L, 20L, ts(30)), (5L, 30L, ts(10))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts(0)), (101L, 10L, ts(15)), (102L, 10L, ts(40)),
      (103L, 20L, ts(20)) // before user 20's only event
    ).toDF("state_id", "user_id", "ts")
    val out = AsOfJoin.forward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"),
        rightTieBreak = "state_id")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong)))
    assert(out.toSeq === Seq(
      1L -> Some(101L), // ts 5 → next right at 15
      2L -> Some(101L), // ts 15 → EXACT match included
      3L -> None,       // ts 45 → nothing after
      4L -> None,       // user 20: only right row is in the past
      5L -> None))      // user 30: no right rows at all
  }

  test("forward duplicate right timestamps: the LOWER tie-break wins (earliest state)") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((200L, 7L, ts(10)), (201L, 7L, ts(10)))
      .toDF("state_id", "user_id", "ts")
    val out = AsOfJoin.forward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"),
        rightTieBreak = "state_id")
      .head()
    assert(out.getAs[Long]("asof_id") === 200L)
  }

  test("tolerance nullifies stale matches, keeps fresh ones, both directions") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(30)), (2L, 10L, ts(31))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts(0)), (101L, 10L, ts(29)), (102L, 10L, ts(50)))
      .toDF("state_id", "user_id", "ts")
    val back = AsOfJoin.backward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"), rightTieBreak = "state_id",
        tolerance = Some("INTERVAL 2 MINUTE"))
      .orderBy("event_id").collect()
      .map(r => Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong))
    assert(back.toSeq === Seq(Some(101L), Some(101L))) // 29 within 2 min of 30 and 31
    val backTight = AsOfJoin.backward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"), rightTieBreak = "state_id",
        tolerance = Some("INTERVAL 1 MINUTE"))
      .orderBy("event_id").collect()
      .map(r => Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong))
    assert(backTight.toSeq === Seq(Some(101L), None)) // 31 − 29 > 1 min → stale
    val fwd = AsOfJoin.forward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("state_id" -> "asof_id"), rightTieBreak = "state_id",
        tolerance = Some("INTERVAL 19 MINUTE"))
      .orderBy("event_id").collect()
      .map(r => Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong))
    assert(fwd.toSeq === Seq(None, Some(102L))) // 50 − 30 > 19 min; 50 − 31 = 19 ok
  }

  test("left columns pass through unchanged") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(10), "hello")).toDF("event_id", "user_id", "ts", "note")
    val right = Seq((9L, 7L, ts(1))).toDF("state_id", "user_id", "ts")
    val row = AsOfJoin.backward(left, right,
      key = "user_id", leftTs = "ts", rightTs = "ts",
      rightPayload = Seq("state_id" -> "asof_id"), rightTieBreak = "state_id").head()
    assert(row.getAs[String]("note") === "hello")
    assert(row.getAs[Long]("asof_id") === 9L)
  }
}
