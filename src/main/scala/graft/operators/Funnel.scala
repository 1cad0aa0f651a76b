package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Ordered-funnel analysis — the earliest step-by-step completion of an
  * event sequence per user ("view → click → purchase"), the classic
  * event-analytics operator behavioral pipelines report conversion
  * from. The reference's event surface stops at windows/sessions
  * (s1/s2); this is the cross-EVENT-TYPE ordering statistic.
  *
  * Semantics (greedy-earliest, the standard funnel definition): t₁ =
  * the user's first step-1 event; tᵢ₊₁ = the first step-(i+1) event at
  * or after tᵢ; a missing step leaves tᵢ₊₁ and every later step NULL.
  * Greedy-earliest is deterministic and prefix-monotone (adding later
  * events never changes an earlier tᵢ) — and relational: each step is
  * one conditional min, so the whole funnel is SQL-replayable.
  *
  * Scale shape: one filtered aggregation per step plus a left join per
  * transition, ALL keyed on the user column — k−1 co-keyed
  * shuffle-joins for a k-step funnel, never a per-user sorted event
  * collection (the collect_list alternative holds a user's whole
  * history in one buffer — unbounded for power users; the join chain's
  * state is one row per user per step). The step filter pushes to the
  * scan, so each pass reads only its step's events. */
object Funnel {

  /** Per-user earliest completion times → (user, t1..tk, reached).
    * `steps` are event-type values in funnel order (≥ 2). Output times
    * are NULL where the funnel stalled; `reached` counts completed
    * steps (≥ 1 by construction — users with no step-1 event have no
    * row). */
  def earliestCompletion(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size,
      s"repeated step types are ambiguous: $steps")
    val ev = events
      .select(col(userCol).as("user"), col(typeCol).as("et"),
        col(tsCol).as("ts"))
      .where(col("user").isNotNull && col("ts").isNotNull &&
        col("et").isin(steps.map(x => x: Any): _*))
    var acc = ev.where(col("et") === steps.head)
      .groupBy("user").agg(min(col("ts")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val si = ev.where(col("et") === st)
        .select(col("user"), col("ts").as("__ts"))
      val prev = (1 to i).map(j => col(s"t$j"))
      // left join keeps stalled users; a NULL tᵢ nulls the condition,
      // so the min — and every later step — stays NULL
      acc = acc.join(si, Seq("user"), "left")
        .groupBy((col("user") +: prev): _*)
        .agg(min(when(col("__ts") >= col(s"t$i"), col("__ts")))
          .as(s"t${i + 1}"))
    }
    val reached = steps.indices.map(i => col(s"t${i + 1}").isNotNull
      .cast("int")).reduce(_ + _)
    acc.withColumn("reached", reached)
  }

  /** Time-to-convert distribution over COMPLETED funnels — the latency
    * report product analytics serves next to the completion counts:
    * per requested quantile, the rank-exact first-to-last-step duration
    * (the k3 ⌈q·n⌉ selection over exact integer epoch-µs durations,
    * user tie-break — pure row selection, no interpolation, so the
    * whole report replays bit-for-bit in any engine).
    *
    * Scale shape: completed funnels are one row per converting user
    * (output-sized), so the single global rank window sorts user-count
    * rows, never events — the same bound every per-user rollup in the
    * x-family carries. Output: (q, n_completed, dur_us). */
  def latencyQuantiles(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      qs: Seq[Double]): DataFrame = {
    val last = s"t${steps.size}"
    val done = earliestCompletion(events, userCol, typeCol, tsCol, steps)
      .where(col(last).isNotNull)
      .select(col("user"),
        (unix_micros(col(last)) - unix_micros(col("t1"))).as("dur_us"))
    quantilesOverDurations(done, qs)
  }

  /** The rank-exact selection half of [[latencyQuantiles]] over an
    * ALREADY-DERIVED (user, dur_us) completion frame — shared with the
    * streaming-accumulated completions ([[graft.streaming.EventsStream
    * .funnelStatefulStream]], the s13 gate), so both faces serve the
    * identical report. */
  def quantilesOverDurations(done: DataFrame, qs: Seq[Double])
      : DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: $qs")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur_us").asc, col("user").asc)
    val ranked = done.withColumn("__rn", row_number().over(w))
    val targets = done.agg(count(lit(1)).as("n_completed"))
      .select(col("n_completed"),
        explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("__rq",
        ceil(col("q") * col("n_completed")).cast("int"))
    targets.join(ranked, col("__rq") === col("__rn"))
      .select(col("q"), col("n_completed"), col("dur_us"))
  }
}
