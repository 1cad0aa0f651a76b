package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{token_set_ratio, wratio}
import graft.operators.{Blocking, SimilarityJoin, SimilarityJoinConfig}

/** The reference's two fuzzy-match flows, re-expressed as lazy Spark plans.
  *
  * Salary match (J1): /root/reference/src/fuzzy_match_salary.py:27-189 —
  * payroll fiscal-year filter, job posting-date cleanup, post_until
  * null-fill, similarity join at token_set≥85 / WRatio≥85 with the
  * salary-band theta predicate, optional per-job top-k.
  *
  * Lightcast match (J2): /root/reference/src/fuzzy_match_jobs_durations.py:19-120
  * — matched titles × SOC occupations at 75/75, carrying all lightcast
  * columns through (documented intent; see SURVEY §2.11 item 1).
  */
object NycPipeline {

  /** P4: lenient posting_date parse (null on failure), drop unparseable,
    * reformat to canonical string (fuzzy_match_salary.py:76-82; implements
    * the documented intent of the reference's broken `.alias` chain). */
  def cleanPostingDates(jobs: DataFrame): DataFrame =
    jobs
      .withColumn("__parsed",
        try_to_timestamp(col("posting_date"), lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")))
      .where(col("__parsed").isNotNull)
      .withColumn("posting_date", date_format(col("__parsed"), "yyyy-MM-dd'T'HH:mm:ss"))
      .drop("__parsed")

  /** P5: null post_until ← posting_date + 30 days as uppercase dd-MMM-yyyy
    * (utils.py:118-138). */
  def fillPostUntil(jobs: DataFrame): DataFrame =
    jobs.withColumn("post_until",
      when(col("post_until").isNotNull && length(col("post_until")) > 0,
        col("post_until"))
        .otherwise(upper(date_format(
          date_add(try_to_timestamp(col("posting_date"),
            lit("yyyy-MM-dd'T'HH:mm:ss")).cast("date"), 30),
          "dd-MMM-yyyy"))))

  /** P6: salary-band theta predicate (fuzzy_match_salary.py:144-154) —
    * SQL comparison semantics reject nulls for free. */
  val salaryBand: Column =
    col("salary_range_from") <= col("base_salary") &&
      col("base_salary") <= col("salary_range_to")

  /** J1: the salary fuzzy-match flow. Output schema matches the declared
    * reference schema (fuzzy_match_salary.py:94-107) with `score` as the
    * rounded WRatio. */
  def salaryMatch(payroll: DataFrame, jobs: DataFrame,
      scoreCutoff: Double = 85.0, tokenSetThreshold: Double = 85.0,
      limit: Option[Int] = None,
      yearStart: Int = 2024, yearEnd: Int = 2025,
      blocking: Blocking = Blocking.Auto): DataFrame = {
    val payrollF = payroll
      .withColumn("fiscal_year", col("fiscal_year").cast("int"))
      .where(col("fiscal_year").between(yearStart, yearEnd))
    val jobsF = fillPostUntil(cleanPostingDates(jobs))

    val cfg = SimilarityJoinConfig(
      leftKey = "business_title", rightKey = "title_description",
      preScorer = token_set_ratio, preThreshold = tokenSetThreshold,
      scorer = wratio, scoreThreshold = scoreCutoff,
      blocking = blocking,
      extraPredicate = Some(salaryBand),
      topKPerLeft = limit,
      // every carried payroll column participates so the ordering is
      // unique up to fully-identical rows — otherwise repeated runs could
      // emit different pay components for tied (score, title, salary)
      topKTieBreak = Seq(col("title_description"), col("base_salary"),
        col("pay_basis"), col("regular_gross_paid"), col("total_ot_paid"),
        col("total_other_pay")))

    SimilarityJoin(jobsF, payrollF, cfg)
      .select(
        col("business_title"), col("salary_range_from"), col("salary_range_to"),
        col("posting_date"), col("post_until"),
        col("title_description"), col("base_salary"), col("pay_basis"),
        col("regular_gross_paid"), col("total_ot_paid"), col("total_other_pay"),
        round(col("score")).cast("int").as("score"))
  }

  /** J2: matched titles × lightcast SOC occupations at 75/75; keeps every
    * pair ≥ cutoff, carries all lightcast columns, orders per-title by
    * score (fuzzy_match_jobs_durations.py:58-99 + documented intent). */
  def lightcastMatch(matches: DataFrame, lightcast: DataFrame,
      scoreCutoff: Double = 75.0, tokenSetThreshold: Double = 75.0,
      blocking: Blocking = Blocking.Auto): DataFrame = {
    val left = matches.select("business_title").distinct()
    val cfg = SimilarityJoinConfig(
      leftKey = "business_title", rightKey = "Occupation (SOC)",
      preScorer = token_set_ratio, preThreshold = tokenSetThreshold,
      scorer = wratio, scoreThreshold = scoreCutoff,
      blocking = blocking)
    SimilarityJoin(left, lightcast, cfg)
      .withColumn("lightcast_matched_occupation", col("Occupation (SOC)"))
      .withColumn("lightcast_match_score", round(col("score")).cast("int"))
      .drop("score")
  }
}
