package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based SESSIONIZATION — the canonical event-analytics regrouping
  * (every product-analytics stack ships it; the reference's dashboard
  * families aggregate per-request, this recovers the visit): a user's
  * events sorted by time split into sessions wherever the gap to the
  * previous event exceeds the inactivity threshold, and each session
  * rolls up to one row of visit stats.
  *
  * Determinism: the order key is (ts, tie) — the tie column (an event
  * id) makes equal-timestamp ordering engine-independent — and the gap
  * compares exact INTEGER epoch-microseconds (`unix_micros` here,
  * `epoch_us` in the DuckDB oracle): second- or millisecond-truncated
  * comparisons would disagree with a µs-precision engine exactly at
  * the boundary. Strictly-greater-than semantics: a gap of exactly
  * `gapMicros` stays in-session.
  *
  * Scale shape: one hash partition by user (the natural analytics
  * key), then per-user window passes — lag, running boundary sum —
  * and a co-partitioned session rollup; nothing global, no sorted
  * collect. A pathological single user with corpus-scale events would
  * sort in one task (the same per-key bound every per-user window in
  * the x-family carries); real event streams bound per-user volume by
  * time, and the x3 heavy-user valve pattern applies upstream if not.
  *
  * Output: (user, session_idx (1-based, per user in time order),
  * session_start, session_end, n_events, duration_us). */
object Sessions {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0: $gapMicros")
    val w = Window.partitionBy(col("user"))
      .orderBy(col("ts"), col("tie"))
    val base = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(tieCol).as("tie"))
      .withColumn("us", unix_micros(col("ts")))
    val flagged = base.withColumn("brk",
      when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > gapMicros, 1L)
        .otherwise(0L))
    val assigned = flagged.withColumn("session_idx",
      sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assigned.groupBy(col("user"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .select(col("user").as(userCol), col("session_idx"),
        col("session_start"), col("session_end"), col("n_events"),
        col("duration_us"))
  }
}
