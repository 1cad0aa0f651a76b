package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.EventsStream
import graft.queries.Tables.t

/** Batch-mode oracle checks for the streaming transforms (the exact same
  * plan runs under readStream with a watermark — StreamingSpec covers that
  * mode with MemoryStream). */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_event_windows" -> ((s, dir) =>
      EventsStream.windowedStats(t(s, dir, "events"), "1 hour")),
    "s2_sessions" -> ((s, dir) =>
      EventsStream.sessions(t(s, dir, "events"), "30 minutes")),
    "s3_stream_dedup" -> ((s, dir) =>
      EventsStream.firstEventPerKey(t(s, dir, "events"),
        keys = Seq("user_id", "event_type"), tieBreak = Seq("event_id"))),
    "s4_stream_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      EventsStream.enrich(
        t(s, dir, "events"),
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_mktsegment"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_event_windows" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |         AS window_start,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // session semantics: session_window windows [t, t+gap) merge only
    // when they overlap, i.e. a gap of exactly 30 min starts a NEW
    // session — hence >= in the break condition
    "s2_sessions" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   >= INTERVAL '30 minutes'
        |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |g AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |             ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_id""".stripMargin,

    "s3_stream_dedup" ->
      """WITH r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |       value, props
        |FROM r WHERE rn = 1""".stripMargin,

    "s4_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin
  )
}
