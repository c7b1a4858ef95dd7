package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}
import graft.queries.QueryDef.sql

/** Specialized join operators. The as-of join oracle uses DuckDB's
  * native ASOF JOIN, and the range join's uses DuckDB's native
  * inequality join, so both Spark formulations are verified against
  * independent reference implementations of the same semantics. */
object JoinQueries {

  /** Campaign windows for j02 — half-open `[lo, hi)`, deliberately
    * messy: c1 starts before the data, c3 nests inside c2, c4 overlaps
    * c2, c6 runs past the data's end. Literal in BOTH engines (the
    * VALUES list below), so the only computed inputs are the events. */
  private val campaigns: Seq[(String, String, String)] = Seq(
    ("c1_launch", "2023-12-28 00:00:00", "2024-01-03 00:00:00"),
    ("c2_newyear", "2024-01-02 00:00:00", "2024-01-09 00:00:00"),
    ("c3_flash", "2024-01-05 12:00:00", "2024-01-06 12:00:00"),
    ("c4_mid", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
    ("c5_oneday", "2024-01-20 06:00:00", "2024-01-20 18:00:00"),
    ("c6_closeout", "2024-01-25 00:00:00", "2024-02-01 00:00:00"))

  private val campaignsSqlValues: String = campaigns
    .map { case (n, lo, hi) => s"('$n', TIMESTAMP '$lo', TIMESTAMP '$hi')" }
    .mkString(",\n  ")

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
    },

    // Point-in-interval range join: every event tagged with every
    // campaign window containing it (windows overlap and nest, so one
    // event can match several). Spark side is the grid equi-join
    // (RangeJoin.pointInInterval, day-wide cells); the oracle is
    // DuckDB's native inequality join over the same literal windows.
    sql(
      "j02_range_campaigns",
      s"""WITH c(campaign, lo, hi) AS (VALUES
         |  $campaignsSqlValues)
         |SELECT e.event_id, e.ts, c.campaign
         |FROM events e JOIN c ON e.ts >= c.lo AND e.ts < c.hi
         |ORDER BY e.event_id, c.campaign""".stripMargin) { (s, d) =>
      import s.implicits._
      val windows = campaigns
        .map { case (n, lo, hi) =>
          (n, java.sql.Timestamp.valueOf(lo), java.sql.Timestamp.valueOf(hi))
        }
        .toDF("campaign", "lo", "hi")
      RangeJoin.pointInInterval(
          Tables.events(s, d).select(col("event_id"), col("ts")), col("ts"),
          windows, col("lo"), col("hi"),
          cellMicros = 86400L * 1000000L) // day cells ~ the window scale
        .select(col("event_id"), col("ts"), col("campaign"))
        .orderBy(col("event_id"), col("campaign"))
    },

    // Interval × interval OVERLAP join: per-user daily activity
    // windows [first event, last event + 1h) against the campaign
    // windows — "which campaigns were live while this user was
    // active". Both sides are intervals, so this is the overlap
    // generalization of j02: same day-wide grid cells, but each
    // overlapping pair is credited to exactly ONE shared cell
    // (max of the two start cells), so the equi-join needs no
    // dedup shuffle behind it. Oracle: DuckDB's native inequality
    // join over the same derived windows, with the engine's
    // half-open contract (empty intervals match nothing —
    // RangeJoin.intervalOverlap drops lo >= hi) mirrored explicitly
    // so the two sides can never diverge on a degenerate interval.
    sql(
      "j04_interval_overlap",
      s"""WITH c(campaign, lo, hi) AS (VALUES
         |  $campaignsSqlValues),
         |a AS (SELECT user_id, date_trunc('day', ts) AS day,
         |        min(ts) AS a_lo, max(ts) + INTERVAL 1 HOUR AS a_hi
         |      FROM events GROUP BY 1, 2)
         |SELECT a.user_id, a.day, c.campaign
         |FROM a JOIN c ON a.a_lo < c.hi AND c.lo < a.a_hi
         |  AND a.a_lo < a.a_hi AND c.lo < c.hi
         |ORDER BY a.user_id, a.day, c.campaign""".stripMargin) { (s, d) =>
      import s.implicits._
      val windows = campaigns
        .map { case (n, lo, hi) =>
          (n, java.sql.Timestamp.valueOf(lo), java.sql.Timestamp.valueOf(hi))
        }
        .toDF("campaign", "lo", "hi")
      val activity = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("a_lo"),
          (max(col("ts")) + expr("INTERVAL 1 HOUR")).as("a_hi"))
      RangeJoin.intervalOverlap(
          activity, col("a_lo"), col("a_hi"),
          windows, col("lo"), col("hi"),
          cellMicros = 86400L * 1000000L)
        .select(col("user_id"), col("day"), col("campaign"))
        .orderBy(col("user_id"), col("day"), col("campaign"))
    },

    // FORWARD as-of: for every event, the user's NEXT signup at or
    // after the event (merge_asof direction='forward') — same
    // one-shuffle union+window plan as a01, mirrored to
    // first-over-following. Oracle: DuckDB's native ASOF with the
    // inequality flipped.
    sql(
      "a02_asof_next_signup",
      """WITH s AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, e.user_id, e.ts,
        |  s.ts AS next_signup_ts, s.event_id AS next_signup_event_id
        |FROM events e
        |ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts <= s.ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOfJoin.forward(
          events.select(col("event_id"), col("user_id"), col("ts")),
          signups,
          key = "user_id", leftTs = "ts", rightTs = "ts",
          rightPayload = Seq("ts" -> "next_signup_ts", "event_id" -> "next_signup_event_id"),
          rightTieBreak = "event_id")
        .orderBy(col("event_id"))
    },

    // TOLERANCE as-of: a01's backward lookup, but a signup older than
    // 2 days is STALE — the match nullifies instead of silently
    // shipping an outdated feature (merge_asof's tolerance). The
    // window match is unchanged; only the acceptance bound differs, so
    // the oracle is a01's ASOF with a post-join CASE.
    sql(
      "a03_asof_signup_within",
      """WITH s AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, e.user_id, e.ts,
        |  CASE WHEN s.ts >= e.ts - INTERVAL 2 DAY THEN s.ts END AS signup_ts,
        |  CASE WHEN s.ts >= e.ts - INTERVAL 2 DAY THEN s.event_id END AS signup_event_id
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
          rightTieBreak = "event_id",
          tolerance = Some("INTERVAL 2 DAY"))
        .orderBy(col("event_id"))
    },

    // Salted hot-key join: events carry only 5 distinct event_types, so
    // a plain shuffle join lands the whole fact table on 5 reducers no
    // matter how many executors exist; Skew.saltedJoin spreads each key
    // over 16 salt buckets (deterministic pmod(event_id), never rand())
    // while the 5-row dimension replicates x16 — the standard trade
    // when the build side is too big to broadcast at real scale (the
    // shuffle_hash hint stands in for that here). Row-identical to the
    // plain join: the oracle IS the plain join.
    sql(
      "j03_salted_join",
      s"""WITH dim(d_type, weight) AS (VALUES
         |  $weightsSqlValues)
         |SELECT e.event_id, e.event_type, round(e.value * d.weight + 1e-9, 2) AS weighted
         |FROM events e JOIN dim d ON e.event_type = d.d_type
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val dim = weights.toDF("d_type", "weight")
      graft.operators.Skew.saltedJoin(
          Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
          col("event_type"), col("event_id"),
          dim, col("d_type"), buckets = 16)
        .select(col("event_id"), col("event_type"),
          round(col("value") * col("weight") + 1e-9, 2).as("weighted"))
        .orderBy(col("event_id"))
    },

    // Bloom-filter semi-join reduction: the dimension is filtered to a
    // nation subset and the fact side is pruned BEFORE its shuffle by a
    // Bloom sketch of the surviving supplier keys (BloomPrune — a
    // distributed treeAggregate build, then a codegen'd plan-constant
    // probe). The merge hint models the at-scale case where the dim is
    // too big to broadcast (with a broadcast join the prune would be
    // moot). No false negatives ⇒ row-identical to the plain join,
    // which IS the oracle; false positives die in the real join.
    sql(
      "q40_bloom_join",
      """SELECT s.s_suppkey, s.s_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE s.s_nationkey IN (5, 8, 12, 19)
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey").isin(5, 8, 12, 19))
        .select(col("s_suppkey"), col("s_name"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      graft.operators.BloomPrune.bloomJoin(
          fact, "l_suppkey", dim, "s_suppkey",
          expectedNumItems = 1000L, dimJoinHint = Some("merge"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 1e-9, 2)
            .as("revenue"))
        .orderBy(col("s_suppkey"))
    }
  )

  /** j03's dimension — per-type scoring weights, literal in BOTH
    * engines (j02's campaign-VALUES convention). */
  private lazy val weights: Seq[(String, Double)] = Seq(
    ("click", 1.5), ("error", 0.0), ("purchase", 5.0),
    ("signup", 2.0), ("view", 0.5))

  private lazy val weightsSqlValues: String = weights
    .map { case (t, w) => s"('$t', $w)" }.mkString(",\n  ")
}
