package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The four GOLD materializations (/root/reference/sql/cleaned.sql:2-51),
  * run as Spark SQL over the bronze match outputs. Idempotent via
  * CREATE TABLE IF NOT EXISTS, exactly like the reference's DuckDB script.
  */
object GoldLayer {

  /** sql/cleaned.sql:2-15 — projection/rename + date-diff + sort. */
  val salaryMatchesSql: String =
    """CREATE TABLE IF NOT EXISTS gold.nyc_salary_matches AS
      |SELECT
      |  business_title AS posted_job_title,
      |  title_description AS matched_actual_payroll_title,
      |  score AS match_score,
      |  salary_range_from AS posting_min_salary,
      |  salary_range_to AS posting_max_salary,
      |  base_salary AS actual_base_salary,
      |  CAST(datediff(to_date(post_until, 'dd-MMM-yyyy'),
      |                to_date(substring(posting_date, 1, 10))) AS INT)
      |    AS posting_duration_days,
      |  regular_gross_paid AS actual_gross_paid,
      |  total_ot_paid AS actual_ot_paid,
      |  total_other_pay AS actual_other_pay
      |FROM bronze.payroll_to_jobs_title_fuzzy_matches
      |ORDER BY match_score DESC""".stripMargin

  /** sql/cleaned.sql:17-24. */
  val socDurationSql: String =
    """CREATE TABLE IF NOT EXISTS gold.nyc_matched_job_posting_duration_soc AS
      |SELECT
      |  business_title AS title,
      |  lightcast_matched_occupation,
      |  `Total Postings (Jan 2024 - Jun 2025)` AS total_postings,
      |  `Median Posting Duration` AS median_posting_duration
      |FROM bronze.jobs_to_lightcast_title_fuzzy_matches
      |ORDER BY median_posting_duration DESC""".stripMargin

  /** sql/cleaned.sql:28-42 — one row per posted title via MAX. */
  val salaryMatchesUniqueSql: String =
    """CREATE TABLE IF NOT EXISTS gold.nyc_salary_matches_unique_job_posting_title AS
      |SELECT
      |  business_title AS posted_job_title,
      |  MAX(title_description) AS matched_actual_payroll_title,
      |  MAX(score) AS match_score,
      |  MAX(salary_range_from) AS posting_min_salary,
      |  MAX(salary_range_to) AS posting_max_salary,
      |  MAX(base_salary) AS actual_base_salary,
      |  MAX(CAST(datediff(to_date(post_until, 'dd-MMM-yyyy'),
      |                    to_date(substring(posting_date, 1, 10))) AS INT))
      |    AS posting_duration_days,
      |  MAX(regular_gross_paid) AS actual_gross_paid,
      |  MAX(total_ot_paid) AS actual_ot_paid,
      |  MAX(total_other_pay) AS actual_other_pay
      |FROM bronze.payroll_to_jobs_title_fuzzy_matches
      |GROUP BY business_title
      |ORDER BY match_score DESC""".stripMargin

  /** sql/cleaned.sql:44-51 — DISTINCT. */
  val socDurationUniqueSql: String =
    """CREATE TABLE IF NOT EXISTS gold.nyc_matched_job_posting_duration_soc_unique_title AS
      |SELECT DISTINCT
      |  business_title AS title,
      |  lightcast_matched_occupation,
      |  `Total Postings (Jan 2024 - Jun 2025)` AS total_postings,
      |  `Median Posting Duration` AS median_posting_duration
      |FROM bronze.jobs_to_lightcast_title_fuzzy_matches
      |ORDER BY median_posting_duration DESC""".stripMargin

  val all: Seq[String] = Seq(salaryMatchesSql, socDurationSql,
    salaryMatchesUniqueSql, socDurationUniqueSql)

  // derived from the CTAS text itself so a renamed gold table can never
  // drift apart from what refresh drops
  private val tables: Seq[String] =
    all.map("""CREATE TABLE IF NOT EXISTS gold\.(\w+)""".r
      .findFirstMatchIn(_).get.group(1))

  /** Run the gold layer (reference src/cleaned_data.py:16-46). Default
    * mirrors the reference's CREATE TABLE IF NOT EXISTS — gold built once
    * never changes even when bronze does; `refresh = true` drops and
    * rebuilds the four tables from current bronze so a re-run of the
    * weekly chain propagates. */
  def run(spark: SparkSession, refresh: Boolean = false): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
    if (refresh) tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS gold.$t"))
    // a crashed earlier run can leave a table's location without its
    // catalog entry; CTAS refuses to adopt it and the weekly chain wedges
    tables.foreach(graft.sources.Bronze.dropOrphanLocation(spark, "gold", _))
    all.foreach(spark.sql(_))
  }
}
