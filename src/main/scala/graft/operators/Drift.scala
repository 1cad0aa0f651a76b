package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution DRIFT between adjacent periods — the monitoring
  * operator a continuously-fed pipeline runs over every snapshot
  * boundary (crawl-over-crawl source mix, week-over-week event mix):
  * for each consecutive period pair, the total-variation distance
  * between the categorical distributions, flagged past a threshold.
  * TV is the right default monitor: symmetric, bounded [0,1], defined
  * when a category is absent from one side (where PSI's ln(p/q)
  * diverges), and — the property everything here is built on —
  * computable EXACTLY.
  *
  * Exactness discipline (p7's): the sum runs over the common
  * denominator n_a·n_b as exact integer arithmetic,
  * Σ_c |cnt_a(c)·n_b − cnt_b(c)·n_a| in decimal(38,0) (products reach
  * 10²¹ at 100 TB), one double division + round(…,6) at the end — no
  * float accumulation, so the report replays bit-for-bit anywhere.
  *
  * Scale shape: one map-side-combined (period, category) count over
  * the scan; everything after is output-sized — the period ledger
  * (|periods| rows) ranks in one tiny window, adjacent pairs join to
  * the broadcast category dimension, and the per-(pair, category)
  * terms re-aggregate to |pairs| rows. NULL periods/categories drop
  * (an unknown snapshot or category assigns mass to nothing). */
object Drift {

  /** (period_a, period_b, n_a, n_b, tv_dist, drifted) for every
    * adjacent pair of distinct `periodCol` values in ascending order. */
  def tvDrift(df: DataFrame, periodCol: String, catCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    val rows = df.where(col(periodCol).isNotNull && col(catCol).isNotNull)
      .select(col(periodCol).as("__p"), col(catCol).as("__c"))
    tvFromCounts(rows.groupBy("__p", "__c")
      .agg(count(lit(1)).as("__cnt")), threshold)
  }

  /** [[tvDrift]] served from a MAINTAINED (period, category, count)
    * ledger instead of a corpus scan — the streaming face (s15): the
    * ledger is an ADDITIVE fold, so a continuously-fed pipeline
    * maintains it via the batch-id transactional discipline
    * ([[graft.pipeline.SilverIndex.refreshDriftLedger]], the s9/CMS
    * family — counts are neither merge-idempotent nor
    * id-anti-join-able) and the monitor reads |periods|·|categories|
    * rows on demand, never the corpus. The maintained ledger equals
    * the batch build exactly, so the arithmetic — and the oracle — is
    * [[tvDrift]]'s verbatim. */
  def tvDriftFromLedger(ledger: DataFrame, periodCol: String,
      catCol: String, cntCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    tvFromCounts(ledger.select(col(periodCol).as("__p"),
      col(catCol).as("__c"), col(cntCol).cast("long").as("__cnt")),
      threshold)
  }

  /** VOLUME LEVEL-SHIFT monitor — [[tvDrift]]'s sibling on the count
    * axis: the categorical mix can hold perfectly steady while the
    * feed silently halves (a crawler shard dies, an ingest key
    * expires) — TV distance sees nothing, the volume monitor does.
    * For each period t with `windowN` FULL observed periods on each
    * side, compare Σ counts of the `windowN` periods before t against
    * the `windowN` starting at t:
    * shift_ratio = |after − before| / before, flagged past the
    * threshold. Integer sums, ONE double division + round(6) — the
    * x13 exactness discipline. Periods are OBSERVED snapshots: a gap
    * in the calendar is a missing snapshot, not a zero (the same
    * adjacency semantics as [[tvDrift]]); edges without full windows
    * emit nothing rather than a half-window guess. */
  def levelShift(df: DataFrame, periodCol: String, windowN: Int,
      threshold: Double): DataFrame = {
    require(windowN >= 1, s"windowN must be >= 1: $windowN")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    shiftFromCounts(
      df.where(col(periodCol).isNotNull)
        .select(col(periodCol).as("__p"))
        .groupBy("__p").agg(count(lit(1)).as("__n")),
      windowN, threshold)
  }

  /** [[levelShift]] served from the SAME maintained (period, category,
    * count) ledger s15's TV monitor reads — one stored artifact, two
    * monitors (mix drift AND volume drift), neither rescanning the
    * corpus. Per-period volumes are the ledger summed over
    * categories. */
  def levelShiftFromLedger(ledger: DataFrame, periodCol: String,
      cntCol: String, windowN: Int, threshold: Double): DataFrame = {
    require(windowN >= 1, s"windowN must be >= 1: $windowN")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    shiftFromCounts(
      ledger.select(col(periodCol).as("__p"),
          col(cntCol).cast("long").as("__cnt"))
        .groupBy("__p").agg(sum(col("__cnt")).as("__n")),
      windowN, threshold)
  }

  /** Downstream of the per-period volume ledger (|periods| rows —
    * output-sized single-partition windows, the x12 rank
    * discipline). */
  private def shiftFromCounts(perPeriod: DataFrame, windowN: Int,
      threshold: Double): DataFrame = {
    val pp = perPeriod.localCheckpoint(true)
    val ord = org.apache.spark.sql.expressions.Window.orderBy(col("__p"))
    val before = ord.rowsBetween(-windowN, -1)
    val after = ord.rowsBetween(0, windowN - 1)
    pp.select(col("__p").as("period"), col("__n").as("n"),
        sum(col("__n")).over(before).as("before_sum"),
        count(lit(1)).over(before).as("__cb"),
        sum(col("__n")).over(after).as("after_sum"),
        count(lit(1)).over(after).as("__ca"))
      .where(col("__cb") === windowN && col("__ca") === windowN)
      // safe for the count-fed face (counts >= 1 force before_sum >=
      // windowN), but the ledger face accepts arbitrary cnt values — an
      // all-zero or NULL-count window must raise, not emit an Infinity/
      // NULL ratio that reads as "no shift" (ADVICE r16, the exactness
      // discipline)
      .select(col("period"), col("n"), col("before_sum"), col("after_sum"),
        round(abs(col("after_sum") - col("before_sum")).cast("double") /
          when(col("before_sum") > 0, col("before_sum").cast("double"))
            .otherwise(raise_error(concat(
              lit("Drift.levelShift: before_sum must be positive at "),
              lit("period "), col("period").cast("string"), lit(" (got "),
              coalesce(col("before_sum").cast("string"), lit("NULL")),
              lit(")")))), 6).as("shift_ratio"))
      .withColumn("shifted", (col("shift_ratio") > threshold).cast("long"))
  }

  /** Everything downstream of the (period, category, count) ledger —
    * output-sized by construction, shared verbatim by the scan-fed
    * (x13) and ledger-served (s15) faces. */
  private def tvFromCounts(counts: DataFrame,
      threshold: Double): DataFrame = {
    // the ledger is output-sized and consumed four times (totals,
    // category dimension, both pair sides) — eagerly materialize it so
    // the upstream (corpus scan, or the stored ledger read) pays
    // exactly ONE pass
    val pc = counts.localCheckpoint(true)
    val np = pc.groupBy("__p").agg(sum(col("__cnt")).as("__n"))
    // the period ledger is |periods| rows — the single-partition rank
    // window is output-sized by construction (the x12 rank discipline)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__p"))
    val ranked = np.withColumn("__r", row_number().over(w))
    val pairs = ranked
      .select(col("__p").as("period_a"), col("__n").as("n_a"), col("__r"))
      .join(ranked.select(col("__p").as("period_b"),
          col("__n").as("n_b"), (col("__r") - 1).as("__r")),
        Seq("__r"))
      .drop("__r")
    val cats = broadcast(pc.select(col("__c")).distinct())
    val cntA = pc.select(col("__p").as("__pa"), col("__c").as("__ca"),
      col("__cnt").as("__cnta"))
    val cntB = pc.select(col("__p").as("__pb"), col("__c").as("__cb"),
      col("__cnt").as("__cntb"))
    val dec = "decimal(38,0)"
    val term = abs(
      coalesce(col("__cnta"), lit(0L)).cast(dec) * col("n_b").cast(dec) -
        coalesce(col("__cntb"), lit(0L)).cast(dec) * col("n_a").cast(dec))
    pairs.crossJoin(cats)
      .join(cntA, col("period_a") === col("__pa") &&
        col("__c") === col("__ca"), "left")
      .join(cntB, col("period_b") === col("__pb") &&
        col("__c") === col("__cb"), "left")
      .groupBy(col("period_a"), col("period_b"), col("n_a"), col("n_b"))
      .agg(sum(term).as("__num"))
      .select(col("period_a"), col("period_b"), col("n_a"), col("n_b"),
        round(col("__num").cast("double") /
          (lit(2.0) * col("n_a").cast("double") *
            col("n_b").cast("double")), 6).as("tv_dist"))
      .withColumn("drifted", (col("tv_dist") > threshold).cast("long"))
  }
}
