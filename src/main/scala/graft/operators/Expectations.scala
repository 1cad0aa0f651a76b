package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality expectations — the dbt-test / Great-
  * Expectations-shaped validation report a production lake runs before
  * promoting a batch (the reference's weekly chain promotes bronze →
  * gold with no checks at all; an AUDIT platform should audit its own
  * inputs — reference intent: the data-quality framing of
  * project_report.md's methodology section).
  *
  * Each check is a row-level `valid` predicate; a row violates the
  * check when the predicate is false OR null (SQL three-valued logic:
  * "I cannot show this row valid" is a violation, so a NULL in a range
  * check surfaces instead of vanishing). The report carries one row
  * per check: (table, check, n_rows, violations, pass).
  *
  * Scale: ALL row checks over a table fold in ONE map-side-combined
  * scan — `report` builds a single aggregate over conditional sums, so
  * 20 checks on a 100 TB table cost one pass, not 20. Key-uniqueness
  * checks ride the same aggregate via count(distinct), which adds an
  * expand (one extra shuffle of (key)-sized partials) but no extra
  * scan. Referential checks ([[fkReport]]) are the one genuinely
  * two-table expectation: one join against the parent's distinct keys,
  * unhinted so AQE broadcasts dimension-sized parents at runtime (the
  * d16 lesson — a forced broadcast becomes the OOM at 1000×).
  */
object Expectations {

  /** A row-level expectation: `valid` must be true for the row to
    * pass; false OR NULL counts as a violation. */
  final case class Check(name: String, valid: Column)

  /** A key-uniqueness expectation over `key`: violations = the number
    * of NON-NULL-keyed rows in excess of the distinct key count (rows
    * that share an already-seen key). NULL keys are not "duplicates of
    * each other" — guard them separately with a not-null [[Check]]. */
  final case class UniqueKey(name: String, key: Column)

  private val reportCols =
    Seq("table_name", "check_name", "n_rows", "violations", "pass")

  /** The per-check report over ONE scan of `df`. */
  def report(df: DataFrame, table: String, checks: Seq[Check],
      uniques: Seq[UniqueKey] = Nil): DataFrame = {
    require(checks.nonEmpty || uniques.nonEmpty, "no expectations given")
    val names = checks.map(_.name) ++ uniques.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).mkString(", ")}" +
        " — each check needs a distinct name (they become report rows " +
        "and aggregate aliases)")
    // names splice into aggregate aliases re-resolved via col("__v_<name>"),
    // and col() parses dots as struct-field access — a dotted or quoted
    // name would fail resolution with a misleading analysis error
    names.foreach(n => require(n.matches("[A-Za-z0-9_]+"),
      s"check name '$n' must match [A-Za-z0-9_]+ (names become " +
        "aggregate aliases resolved with col(), where '.' and '`' " +
        "change the parse)"))
    val n = count(lit(1)).as("__n")
    val vioAggs = checks.map(c =>
      sum(when(!coalesce(c.valid, lit(false)), 1L).otherwise(0L))
        .as(s"__v_${c.name}"))
    val uniAggs = uniques.flatMap(u => Seq(
      count(u.key).as(s"__k_${u.name}"),
      countDistinct(u.key).as(s"__d_${u.name}")))
    val aggs = vioAggs ++ uniAggs
    val one = df.agg(n, aggs: _*)
    val rows =
      checks.map(c => struct(lit(c.name).as("check_name"),
        coalesce(col(s"__v_${c.name}"), lit(0L)).as("violations"))) ++
      uniques.map(u => struct(lit(u.name).as("check_name"),
        (col(s"__k_${u.name}") - col(s"__d_${u.name}")).as("violations")))
    one.select(lit(table).as("table_name"), col("__n").as("n_rows"),
        explode(array(rows: _*)).as("c"))
      .select(col("table_name"), col("c.check_name"), col("n_rows"),
        col("c.violations"), (col("c.violations") === 0L).as("pass"))
      .select(reportCols.map(col): _*)
  }

  /** VOLUME expectation against a MAINTAINED (period, category, cnt)
    * drift ledger (the x15/s17 artifact) — the dynamic check the static
    * row predicates cannot express (VERDICT r17 task 5): every row of a
    * half-dead feed can pass every schema/range/uniqueness check while
    * the batch itself is the anomaly (a crawler shard died, an ingest
    * key expired, a retry loop doubled the feed). The x15 arithmetic,
    * batch-sized: treat the staged batch as one period and compare it
    * against the MEAN of the ledger's last `windowN` periods —
    * shift_ratio = |batchRows·windowN − Σ last-N| / Σ last-N (integer
    * sums, ONE double division, round 6 — the x13 exactness
    * discipline), violated past `threshold`. Emits NOTHING when the
    * ledger holds fewer than `windowN` periods (the x15 edge
    * semantics: no half-window guesses — a cold ledger gates nothing),
    * and raises on a nonpositive window sum rather than emitting an
    * Infinity ratio that reads as "no shift" (the r16 levelShift fix).
    * Output: one [[report]]-shaped row, so ingest gates union it with
    * the static suite and decide on `pass` uniformly.
    *
    * Scale: the ledger is |periods|·|categories| rows — output-sized —
    * and the batch contributes only its row COUNT; nothing here
    * rescans any corpus. */
  def volumeReport(batchRows: Long, ledger: DataFrame, periodCol: String,
      cntCol: String, windowN: Int, threshold: Double, table: String,
      name: String): DataFrame = {
    require(windowN >= 1, s"windowN must be >= 1: $windowN")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    require(batchRows >= 0, s"batchRows must be >= 0: $batchRows")
    val lastN = ledger
      .where(col(periodCol).isNotNull)
      .select(col(periodCol).as("__p"), col(cntCol).cast("long").as("__c"))
      .groupBy("__p").agg(sum(col("__c")).as("__n"))
      .orderBy(col("__p").desc).limit(windowN)
    val ratio = round(
      abs(lit(batchRows) * windowN - col("__before")).cast("double") /
        when(col("__before") > 0, col("__before").cast("double"))
          .otherwise(raise_error(concat(
            lit(s"Expectations.volumeReport($table/$name): the last-"),
            lit(s"$windowN-period ledger sum must be positive (got "),
            coalesce(col("__before").cast("string"), lit("NULL")),
            lit(")")))), 6)
    lastN
      .agg(count(lit(1)).as("__k"),
        coalesce(sum(col("__n")), lit(0L)).as("__before"))
      .where(col("__k") === windowN)
      .select(lit(table).as("table_name"), lit(name).as("check_name"),
        lit(batchRows).as("n_rows"),
        when(ratio > threshold, 1L).otherwise(0L).as("violations"),
        (ratio <= threshold).as("pass"))
      .select(reportCols.map(col): _*)
  }

  /** Referential-integrity expectation: every non-null `childKey` must
    * exist in `parent`'s `parentKey`. Violations = orphan child ROWS
    * (not distinct orphan keys — each bad row counts, matching the
    * row-check semantics above). One left join against the parent's
    * distinct keys; unhinted, so AQE broadcasts a dimension-sized
    * parent and falls back to shuffle when it is not. */
  def fkReport(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, table: String, name: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__ck").isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)).as("violations"))
      .select(lit(table).as("table_name"), lit(name).as("check_name"),
        col("n_rows"), coalesce(col("violations"), lit(0L)).as("violations"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
      .select(reportCols.map(col): _*)
  }
}
