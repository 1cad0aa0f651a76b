package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-DECAYED engagement scores — the feature-store staple
  * (recommendation/user-model pipelines weight recent activity above
  * stale activity): each event contributes `2^−(age/halfLife)` to its
  * (user, event_type) score, halving per half-life elapsed.
  *
  * Determinism is the whole design: the decay base is 2 and the
  * exponent an INTEGER (elapsed whole half-lives, day-granular from a
  * data-derived reference date — the corpus max, never wall-clock), so
  * every weight is an exact power of two (one exact IEEE division by
  * `1L << k`) and the score is a sum of multiples of 2^−cap that fits
  * a double's 53-bit mantissa EXACTLY (cap 30 + group counts < 2²³) —
  * the sum is order-independent and replays bit-for-bit in any engine,
  * where `pow(0.5, age/half)` with a fractional exponent would float-
  * drift. The cap floors weights at 2⁻³⁰ ≈ 1e−9 — operationally zero,
  * and events that old all weigh the same instead of underflowing.
  *
  * Timezone contract (the Burst discipline): `to_date` derives day
  * ages in the SESSION timezone (`spark.sql.session.timeZone`), so
  * cross-engine parity is pinned for UTC sessions — the harness
  * default — while an offset session zone would shift day boundaries
  * relative to an engine truncating naive timestamps. Results remain
  * deterministic for any fixed session zone.
  *
  * Scale shape: one output-sized reference aggregate (broadcast as a
  * 1-row cross join — the x3 discipline), then a single
  * map-side-combined groupBy over the events scan. Nothing per-user
  * but the rollup row. */
object Decay {

  /** Exponent cap: weights floor at 2⁻³⁰ so Σ(multiples of 2⁻³⁰) stays
    * exact for up to 2²³ events per group. */
  val CapHalfLives = 30

  /** The exact-replay bound: a sum of 2⁻³⁰-multiples stays inside the
    * 53-bit mantissa only while a group holds < 2²³ events. */
  val MaxExactEvents: Long = 1L << 23

  /** (user, event_type, n_events, last_age_days, score) — score =
    * Σ events 2^−min(age_days DIV halfLifeDays, 30), age in whole days
    * before the corpus' newest event date.
    *
    * The bit-for-bit replay contract is ENFORCED, not advisory: a
    * group reaching `maxExactEvents` (default 2²³, the mantissa bound
    * above) raises at execution instead of silently degrading to an
    * order-dependent approximate sum. The check rides the per-group
    * output rows — free at scale. Callers that accept approximate
    * scores for hotter groups pass `Long.MaxValue` explicitly. */
  /** Recency-decayed CATEGORY frequency from a (period, category,
    * count) DAY ledger — "what is trending" served from the SAME
    * maintained artifact family the drift (s15) and volume (s17)
    * monitors read: score(c) = Σ_days cnt(c, day) · 2^−min(age DIV
    * halfLifeDays, 30), ages in whole days before the ledger's newest
    * period. The [[halfLifeScores]] exactness discipline lifted from
    * per-event weights to per-day count·weight terms: every term is a
    * count times an exact power of two, so the per-category sum
    * replays bit-for-bit while Σ counts stays under the enforced
    * mantissa bound (same `maxExactEvents` contract, here counting
    * LEDGER MASS per category — raise, never silently degrade).
    *
    * Scale: the ledger is |days|·|categories| rows (output-sized); the
    * reference date is one broadcast aggregate; nothing touches the
    * corpus. Output: (category, n_total, last_age_days, score). */
  def decayedCountsFromLedger(ledger: DataFrame, periodCol: String,
      catCol: String, cntCol: String, halfLifeDays: Int,
      maxExactEvents: Long = MaxExactEvents): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    require(maxExactEvents >= 1,
      s"maxExactEvents must be >= 1: $maxExactEvents")
    val base = ledger
      .where(col(periodCol).isNotNull && col(catCol).isNotNull)
      .select(col(catCol).as("category"),
        to_date(col(periodCol)).as("d"), col(cntCol).cast("long").as("cnt"))
    val ref = base.agg(max(col("d")).as("ref"))
    base.crossJoin(broadcast(ref))
      .withColumn("age", datediff(col("ref"), col("d")))
      .withColumn("w", expr(
        s"CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), " +
          s"least(age DIV $halfLifeDays, $CapHalfLives))"))
      .groupBy(col("category"))
      .agg(sum(col("cnt")).as("n_total"),
        min(col("age")).as("last_age_days"),
        sum(col("cnt").cast("double") * col("w")).as("score"))
      .withColumn("score",
        when(col("n_total") >= lit(maxExactEvents), raise_error(concat(
          lit("decayedCountsFromLedger: category mass "),
          col("n_total").cast("string"),
          lit(s" (>= $maxExactEvents) — the exact-replay mantissa bound " +
            "is violated; pass maxExactEvents=Long.MaxValue to accept " +
            "an order-dependent approximate sum"))))
          .otherwise(col("score")))
  }

  /** The scan-fed face of [[decayedCountsFromLedger]]: aggregate the
    * events to per-(day, category) counts first (one map-side-combined
    * pass — weights depend only on the day, so the per-day rollup is
    * exact), then the same ledger arithmetic. */
  def decayedCounts(events: DataFrame, catCol: String, tsCol: String,
      halfLifeDays: Int,
      maxExactEvents: Long = MaxExactEvents): DataFrame =
    decayedCountsFromLedger(
      events.where(col(catCol).isNotNull && col(tsCol).isNotNull)
        .select(col(catCol).as("__c"), to_date(col(tsCol)).as("__d"))
        .groupBy("__c", "__d").agg(count(lit(1)).as("__cnt")),
      "__d", "__c", "__cnt", halfLifeDays, maxExactEvents)

  def halfLifeScores(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, halfLifeDays: Int,
      maxExactEvents: Long = MaxExactEvents): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    require(maxExactEvents >= 1,
      s"maxExactEvents must be >= 1: $maxExactEvents")
    val base = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(typeCol).as("etype"),
        to_date(col(tsCol)).as("d"))
    val ref = base.agg(max(col("d")).as("ref"))
    base.crossJoin(broadcast(ref))
      .withColumn("age", datediff(col("ref"), col("d")))
      .withColumn("w", expr(
        s"CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), " +
          s"least(age DIV $halfLifeDays, $CapHalfLives))"))
      .groupBy(col("user"), col("etype"))
      .agg(count(lit(1)).as("n_events"),
        min(col("age")).as("last_age_days"),
        sum(col("w")).as("score"))
      .withColumn("score",
        when(col("n_events") >= lit(maxExactEvents), raise_error(concat(
          lit("halfLifeScores: group holds "), col("n_events").cast("string"),
          lit(s" events (>= $maxExactEvents) — the exact-replay mantissa " +
            "bound is violated; pass maxExactEvents=Long.MaxValue to " +
            "accept an order-dependent approximate sum"))))
          .otherwise(col("score")))
      .select(col("user").as(userCol), col("etype").as(typeCol),
        col("n_events"), col("last_age_days"), col("score"))
  }
}
