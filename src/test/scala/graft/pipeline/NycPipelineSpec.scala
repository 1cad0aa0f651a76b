package graft.pipeline

import graft.SparkTestBase
import graft.functions.FuzzyKernel
import graft.serve.Serve
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end reference parity on FIXTURES.md-shaped data:
  * salary match (J1) → lightcast match (J2) → gold layer → serve.
  */
class NycPipelineSpec extends SparkTestBase {

  private lazy val payroll = {
    val s = spark
    import s.implicits._
    Seq(
      // (title, base_salary, pay_basis, gross, ot, other, fiscal_year)
      ("SOFTWARE ENGINEER", 100000.0, "per Annum", 101000.0, 500.0, 200.0, "2024"),
      ("Software Engineer.", 150000.0, "per Annum", 151000.0, 0.0, 0.0, "2025"),
      ("SOFTWARE ENGINEER", 95000.0, "per Annum", 96000.0, 100.0, 0.0, "2023"), // year-filtered
      ("POLICE OFFICER", 65000.0, "per Annum", 70000.0, 5000.0, 1000.0, "2024"),
      ("POLICE OFFICER", 90000.0, "per Annum", 95000.0, 2000.0, 500.0, "2025"), // out of band
      ("Crossing Guard", 33000.0, "per Annum", 33500.0, 0.0, 0.0, "2024")
    ).toDF("title_description", "base_salary", "pay_basis",
      "regular_gross_paid", "total_ot_paid", "total_other_pay", "fiscal_year")
  }

  private lazy val jobs = {
    val s = spark
    import s.implicits._
    Seq(
      // (business_title, from, to, posting_date, post_until)
      ("Software Engineer", 90000.0, 120000.0, "2025-01-15T00:00:00.000", "15-AUG-2025"),
      ("Senior Software-Engineer", 140000.0, 160000.0, "2025-02-01T00:00:00", null),
      ("Police Officer", 50000.0, 80000.0, "2025-03-10T12:30:00", "01-MAY-2025"),
      ("Crossing Guard", 30000.0, 40000.0, "not-a-date", "01-JUN-2025") // dropped (P4)
    ).toDF("business_title", "salary_range_from", "salary_range_to",
      "posting_date", "post_until")
  }

  private lazy val lightcast = {
    val s = spark
    import s.implicits._
    Seq(
      ("Software Developers", 12000, 35.0),
      ("Police Officers", 4000, 28.5),
      ("Paralegals", 900, 41.0)
    ).toDF("Occupation (SOC)", "Total Postings (Jan 2024 - Jun 2025)",
      "Median Posting Duration")
  }

  private lazy val matches = NycPipeline.salaryMatch(payroll, jobs)

  test("salary match applies year filter, date cleanup, band, thresholds") {
    val rows = matches.collect()
    assert(rows.nonEmpty)
    val schema = matches.columns.toSeq
    assert(schema == Seq("business_title", "salary_range_from", "salary_range_to",
      "posting_date", "post_until", "title_description", "base_salary",
      "pay_basis", "regular_gross_paid", "total_ot_paid", "total_other_pay", "score"))

    // the malformed posting_date row is dropped entirely
    assert(!rows.exists(_.getString(0) == "Crossing Guard"))
    // fiscal_year 2023 payroll row never matches
    assert(!rows.exists(r => r.getString(5) == "SOFTWARE ENGINEER" &&
      r.getDouble(6) == 95000.0))
    // salary band: Police Officer 90000 > 80000 upper bound excluded
    assert(!rows.exists(r => r.getString(0) == "Police Officer" &&
      r.getDouble(6) == 90000.0))
    // in-band Police Officer 65000 present with exact-match score 100
    val po = rows.filter(r => r.getString(0) == "Police Officer")
    assert(po.map(_.getDouble(6)).toSeq == Seq(65000.0))
    assert(po.head.getInt(11) == 100)

    // post_until null-fill: 2025-02-01 + 30d = 03-MAR-2025, uppercased
    val senior = rows.filter(_.getString(0) == "Senior Software-Engineer")
    assert(senior.forall(_.getString(4) == "03-MAR-2025"))
    // canonical posting_date reformat strips fractional seconds
    val se = rows.filter(_.getString(0) == "Software Engineer")
    assert(se.forall(_.getString(3) == "2025-01-15T00:00:00"))
  }

  test("salary match scores equal kernel WRatio on normalized titles") {
    matches.collect().foreach { r =>
      val expected = math.round(FuzzyKernel.wratio(
        FuzzyKernel.normalizeTitle(r.getString(0)),
        FuzzyKernel.normalizeTitle(r.getString(5)))).toInt
      assert(r.getInt(11) == expected)
      assert(r.getInt(11) >= 85)
    }
  }

  test("per-job limit keeps best-scoring payroll rows") {
    val limited = NycPipeline.salaryMatch(payroll, jobs, limit = Some(1))
    val counts = limited.groupBy("business_title").count().collect()
    assert(counts.forall(_.getLong(1) == 1L))
  }

  test("lightcast match carries all lightcast columns at 75/75") {
    val lm = NycPipeline.lightcastMatch(matches, lightcast)
    val cols = lm.columns.toSeq
    assert(cols.contains("Total Postings (Jan 2024 - Jun 2025)"))
    assert(cols.contains("Median Posting Duration"))
    assert(cols.contains("lightcast_matched_occupation"))
    val rows = lm.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      r.getInt(r.fieldIndex("lightcast_match_score")) >= 75))
  }

  test("gold layer + serve end to end") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bronze")
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
    Seq("bronze.payroll_to_jobs_title_fuzzy_matches",
      "bronze.jobs_to_lightcast_title_fuzzy_matches",
      "gold.nyc_salary_matches", "gold.nyc_matched_job_posting_duration_soc",
      "gold.nyc_salary_matches_unique_job_posting_title",
      "gold.nyc_matched_job_posting_duration_soc_unique_title")
      .foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // the session catalog is in-memory per JVM but warehouse dirs
        // persist across test runs — clear locations physically too
        val Array(db, name) = t.split('.')
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:"), s"$db.db/$name")
        org.apache.commons.io.FileUtils.deleteQuietly(loc)
      }

    matches.write.mode("overwrite")
      .saveAsTable("bronze.payroll_to_jobs_title_fuzzy_matches")
    NycPipeline.lightcastMatch(matches, lightcast)
      .write.mode("overwrite")
      .saveAsTable("bronze.jobs_to_lightcast_title_fuzzy_matches")
    GoldLayer.run(spark)

    val gold1 = spark.table("gold.nyc_salary_matches")
    assert(gold1.columns.toSeq == Seq("posted_job_title",
      "matched_actual_payroll_title", "match_score", "posting_min_salary",
      "posting_max_salary", "actual_base_salary", "posting_duration_days",
      "actual_gross_paid", "actual_ot_paid", "actual_other_pay"))
    // duration: Software Engineer posted 2025-01-15 until 15-AUG-2025 = 212 days
    val se = gold1.where(col("posted_job_title") === "Software Engineer").head
    assert(se.getInt(6) == 212)

    val unique = spark.table("gold.nyc_salary_matches_unique_job_posting_title")
    assert(unique.count() ==
      gold1.select("posted_job_title").distinct().count())

    // serve: deterministic pagination
    val page = Serve.fetchDataset(spark, 0, offset = 0, limit = 2).collect()
    assert(page.length <= 2)
    assert(Serve.reportsList.map(_._1) == Seq(0, 1, 2, 3))
    val scores = Serve.fetchDataset(spark, 0).collect().map(_.getInt(2))
    assert(scores.sameElements(scores.sorted.reverse))

    // dashboard range filter + metrics (P8/A4): slider semantics
    val full = spark.table("gold.nyc_salary_matches")
    val Some((mean, lo, hi)) = Serve.scoreStats(full, "match_score")
    assert(lo <= mean && mean <= hi)
    val clipped = Serve.filterScoreRange(full, "match_score", lo, mean)
    assert(clipped.count() > 0 && clipped.count() <= full.count())
    assert(Serve.filterScoreRange(full, "match_score", hi + 1, hi + 2).count() == 0)
    assert(Serve.scoreStats(full.limit(0), "match_score").isEmpty)

    // page boundaries are stable across independent requests: stitching
    // non-overlapping pages reproduces the full result exactly, in order
    val total = spark.table("gold.nyc_salary_matches").count().toInt
    val pageSize = math.max(total / 3, 1)
    val stitched = (0 to total by pageSize).flatMap(o =>
      Serve.fetchDataset(spark, 0, offset = o, limit = pageSize)
        .collect().map(_.toString))
    val whole = Serve.fetchDataset(spark, 0, offset = 0, limit = total + 1)
      .collect().map(_.toString)
    assert(stitched.toSeq == whole.toSeq)
  }
}
