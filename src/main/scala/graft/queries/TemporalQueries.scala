package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TemporalJoins
import graft.queries.Tables.t

/** Temporal-join battery over `events` (engine extensions — SURVEY §2.3
  * lists as-of/interval joins as absent from the reference). Both have
  * full DuckDB oracles (DuckDB 1.0 ships native ASOF JOIN). */
object TemporalQueries {

  /** Right side of the as-of: clicks, deduped to one row per
    * (user_id, ts) with a deterministic winner so both engines resolve
    * ties identically. */
  private def clicks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    t(s, dir, "events").where(col("event_type") === "click")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("value").as("click_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x1: for every purchase, the latest click at-or-before it (per
    // user). Unmatched lefts keep left-join semantics in the operator
    // (spec-covered); the GATE projection coalesces the nulls to
    // sentinels because NaN/NaT cells hash unreliably in a pandas-level
    // compare (CPython hashes NaN by object identity)
    "x1_asof_join" -> ((s, dir) => {
      val purchases = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("value").as("purchase_value"))
      TemporalJoins.asofJoin(purchases, clicks(s, dir),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightCols = Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_value"),
          coalesce(col("asof_ts"), lit("1970-01-01 00:00:00").cast("timestamp"))
            .as("click_ts"),
          coalesce(col("asof_click_id"), lit(-1L)).as("click_id"),
          coalesce(col("asof_click_value"), lit(-1.0)).as("click_value"))
    }),

    // x2: every view within 30 minutes AFTER a click, same user
    "x2_interval_join" -> ((s, dir) => {
      val clicksRaw = t(s, dir, "events")
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val views = t(s, dir, "events")
        .where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      TemporalJoins.intervalJoin(clicksRaw, views,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        window = "30 minutes")
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
          col("view_id"), col("r_ts").as("view_ts"))
    })
  )

  val oracles: Map[String, String] = Map(
    "x1_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id AS click_id, value AS click_value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |                            ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |cd AS (SELECT user_id, ts, click_id, click_value FROM c WHERE rn = 1),
        |p AS (SELECT event_id, ts, user_id, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
        |       coalesce(cd.ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
        |       coalesce(cd.click_id, -1) AS click_id,
        |       coalesce(cd.click_value, -1.0) AS click_value
        |FROM p ASOF LEFT JOIN cd
        |  ON p.user_id = cd.user_id AND p.ts >= cd.ts""".stripMargin,

    "x2_interval_join" ->
      """WITH c AS (SELECT user_id, ts, event_id AS click_id
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, ts, event_id AS view_id
        |      FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, c.ts AS click_ts,
        |       v.view_id, v.ts AS view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin
  )
}
