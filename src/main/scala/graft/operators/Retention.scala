package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Cohort retention — the week-over-week "did the cohort come back"
  * matrix, the other classic event-analytics statistic next to
  * [[Funnel]]'s conversion. Users are cohorted by the ISO week of
  * their FIRST event; each later active week counts them once at
  * offset = (active_week − cohort_week) in weeks. Deterministic
  * (mins, distincts, integer date arithmetic) → fully SQL-replayable.
  *
  * Scale shape: the per-user first-week aggregation and the distinct
  * (user, week) activity set both shuffle on the user column, and the
  * cohort↔activity join is co-keyed on it — one exchange family, no
  * broadcast needed at any corpus size (the cohort frame is |users|,
  * NOT broadcastable at scale). The final (cohort, offset) rollup is
  * output-sized: ~(weeks × weeks) rows regardless of input volume.
  * Nothing holds a user's history in one buffer. */
object Retention {

  /** Weekly cohort retention → (cohort_week, week_offset, n_users).
    * `cohort_week` is the Monday of the cohort's first-activity week;
    * `week_offset` ≥ 0 counts weeks since (0 = the cohort week itself,
    * so offset 0's n_users is the cohort size); `n_users` is the count
    * of DISTINCT cohort members active at that offset. Null users or
    * timestamps are dropped. */
  def weeklyCohorts(df: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val ev = df
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
    val cohorts = ev.groupBy("u").agg(min(col("wk")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohorts, "u")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"), col("u"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("u")).as("n_users"))
      // timestamp, not date32: the downstream compare surface (and most
      // sinks) treat week boundaries as instants
      .withColumn("cohort_week", col("cohort_week").cast("timestamp"))
  }
}
