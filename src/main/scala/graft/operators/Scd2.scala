package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Column}

/** Slowly-Changing-Dimension TYPE 2 history — collapse a keyed change
  * log into effective-dated attribute versions: one row per (key,
  * consecutive-distinct attribute state) with [effective_from,
  * effective_to) ranges and an is_current flag. The audit question the
  * reference's platform cannot answer today ("what did this posting
  * say when the payroll row was paid?") — gold tables there keep only
  * the latest state (/root/reference/sql/cleaned.sql keeps MAX per
  * title); SCD2 is the standard warehouse answer (Kimball's type-2
  * dimension, public methodology).
  *
  * Semantics: rows order per key by (ts, attrs…) — the attribute
  * tie-break makes equal-timestamp arrivals deterministic (the order
  * WITHIN one timestamp is not observable; both engines sort it the
  * same way, which is what the oracle needs). A new version starts
  * where the attribute tuple IS DISTINCT FROM the previous row's
  * (null-safe: NULL→value and value→NULL are real transitions;
  * NULL→NULL is not). Consecutive identical states collapse;
  * effective_to = the next version's effective_from (half-open
  * ranges), NULL on the current version.
  *
  * Scale: two key-partitioned windows (lag to find change points,
  * lead over the change rows for the range end) — no global sort, no
  * driver state; versions are output-sized (one row per transition,
  * not per event). At 100 TB the change log arrives partitioned by
  * key and the windows shuffle once on the key. */
object Scd2 {

  def history(changes: DataFrame, keyCol: String, attrCols: Seq[String],
      tsCol: String): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one attribute column")
    val attrs: Column = struct(attrCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: attrCols.map(col): _*)
    val marked = changes
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: the FIRST row per key has __prev = NULL (a change);
      // a genuinely NULL attribute state only changes when it differs
      .withColumn("__chg", !(col("__prev") <=> attrs))
    val versions = marked.where(col("__chg"))
      .select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol).as("effective_from"): _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("effective_from") +: attrCols.map(col): _*)
    versions
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
