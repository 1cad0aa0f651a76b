package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-burst detection over an event stream — the anomaly flag a
  * monitoring/abuse pipeline derives from the same events the x-family
  * analyzes: hourly event counts per type, each compared against its
  * own TRAILING baseline (the mean of the previous `trailingHours`
  * OBSERVED hourly buckets — a ROWS frame, so calendar gaps don't
  * dilute the baseline; documented, deterministic, and identical in
  * any engine, unlike a RANGE-over-calendar formulation that would
  * need gap filling).
  *
  * Timezone contract (the ASCII/BMP-note discipline): `date_trunc`
  * buckets in the SESSION timezone (`spark.sql.session.timeZone`), so
  * cross-engine parity is pinned for UTC sessions — the harness
  * default — while a half-hour-offset session zone would shift bucket
  * boundaries relative to an engine truncating naive timestamps.
  * Results remain deterministic for any fixed session zone.
  *
  * Engine parity: the baseline is an average of integer counts (exact
  * integer sum ÷ count — bit-identical cross-engine), the ratio is one
  * double division, and both round HALF_UP to 6 only at the OUTPUT;
  * no stddev (Welford accumulation order makes stddev float-drift
  * across engines, so the z-score variant is deliberately NOT the
  * contract — the ratio-to-baseline flag is). Buckets with an empty
  * trailing frame (each type's first hour) emit NULL baseline/ratio
  * and flag 0 in both engines.
  *
  * Scale shape: one map-side-combined groupBy to hourly buckets
  * (output-sized: |types|·|hours|), then per-type windows over those
  * bucket rows — never over raw events. */
object Burst {

  def hourlyBursts(events: DataFrame, typeCol: String, tsCol: String,
      trailingHours: Int, threshold: Double): DataFrame = {
    require(trailingHours >= 1,
      s"trailingHours must be >= 1: $trailingHours")
    require(threshold > 0.0 && java.lang.Double.isFinite(threshold),
      s"threshold must be positive and finite: $threshold")
    val hours = events
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol).as("etype"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("etype")).orderBy(col("hour"))
      .rowsBetween(-trailingHours, -1)
    val ta = avg(col("n_events")).over(w)
    hours
      .withColumn("trailing_avg", round(ta, 6))
      .withColumn("burst_ratio", round(col("n_events") / ta, 6))
      .withColumn("is_burst",
        when(col("n_events") / ta >= threshold, 1L).otherwise(0L))
  }
}
