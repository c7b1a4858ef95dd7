package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.queries.QueryDef.sql

/** Specialized join operators. The as-of join oracle uses DuckDB's
  * native ASOF JOIN, so the union+window Spark formulation is verified
  * against an independent reference implementation of the same
  * semantics. */
object JoinQueries {

  val all: Seq[QueryDef] = Seq(

    // For every event: the user's latest signup at or before the event.
    sql(
      "a01_asof_signup",
      """WITH s AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, e.user_id, e.ts,
        |  s.ts AS signup_ts, s.event_id AS signup_event_id
        |FROM events e
        |ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOfJoin.backward(
          events.select(col("event_id"), col("user_id"), col("ts")),
          signups,
          key = "user_id", leftTs = "ts", rightTs = "ts",
          rightPayload = Seq("ts" -> "signup_ts", "event_id" -> "signup_event_id"),
          rightTieBreak = "event_id")
        .orderBy(col("event_id"))
    }
  )
}
