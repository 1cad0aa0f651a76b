package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The scheduler binding: interval parsing, anchored fixed-rate loop
  * semantics (overrun collapse), cron-style failure tolerance, and the
  * end-to-end contract from VERDICT r4 — two scheduled ticks propagate an
  * upstream lake change through bronze to gold on the refresh path. */
class SchedulerSpec extends SparkTestBase {

  test("parseInterval: ms/s/m/h/d units; garbage rejected") {
    assert(Scheduler.parseInterval("150ms") == 150L)
    assert(Scheduler.parseInterval("30s") == 30000L)
    assert(Scheduler.parseInterval("10m") == 600000L)
    assert(Scheduler.parseInterval("2h") == 7200000L)
    assert(Scheduler.parseInterval("7d") == 604800000L)
    intercept[IllegalArgumentException](Scheduler.parseInterval("weekly"))
    intercept[IllegalArgumentException](Scheduler.parseInterval("5 m"))
    intercept[IllegalArgumentException](Scheduler.parseInterval("-1s"))
  }

  test("loop fires on the anchored grid; overruns collapse missed slots") {
    var t = 1000L
    val firedAt = ArrayBuffer[Long]()
    val n = Scheduler.loop(100, 4,
      sleep = d => t += d, now = () => t) { i =>
      firedAt += t
      if (i == 2) t += 250 // this run overruns its slot by 2.5 intervals
    }
    assert(n == 4)
    // tick2 ends at 1350: slots 1200/1300 are SKIPPED (collapsed), the
    // catch-up tick fires at the next grid point 1400, then the schedule
    // is back on the original anchor
    assert(firedAt.toSeq == Seq(1000L, 1100L, 1400L, 1500L))
  }

  test("a failing tick logs and the schedule keeps firing (cron semantics)") {
    val broken = Seq(IngestFlow.RestDataset("nope", "synthetic://x",
      Seq("f"), fetcherClass = "does.not.Exist"))
    val n = Scheduler.run(spark, broken, "/tmp/graft-sched-void",
      intervalMs = 1, maxTicks = 2, sleep = _ => ())
    assert(n == 2)
  }

  private def writeLightcast(lake: String, medianDays: Double): Unit = {
    val s = spark
    import s.implicits._
    Seq(("Software Developers", 12000L, 35.0),
        ("Police Officers", 4000L, medianDays))
      .toDF("Occupation (SOC)", "Total Postings (Jan 2024 - Jun 2025)",
        "Median Posting Duration")
      .write.mode("overwrite")
      .parquet(s"$lake/lightcast_job_postings_data.parquet")
  }

  private def socMedian(occupation: String): Double =
    spark.table("gold.nyc_matched_job_posting_duration_soc")
      .where(col("lightcast_matched_occupation") === occupation)
      .select("median_posting_duration").head().getDouble(0)

  private val allTables = Seq(
    "bronze.nyc_payroll_data", "bronze.nyc_job_postings_data",
    "bronze.lightcast_job_postings_data",
    "bronze.payroll_to_jobs_title_fuzzy_matches",
    "bronze.jobs_to_lightcast_title_fuzzy_matches",
    "gold.nyc_salary_matches", "gold.nyc_matched_job_posting_duration_soc",
    "gold.nyc_salary_matches_unique_job_posting_title",
    "gold.nyc_matched_job_posting_duration_soc_unique_title")

  private def coldCatalog(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS bronze")
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
    allTables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val Array(db, name) = t.split('.')
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"$db.db/$name")
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
  }

  test("two scheduled ticks propagate a lake change bronze → gold (refresh)") {
    coldCatalog()
    val lake = java.nio.file.Files.createTempDirectory("graft-sched").toString
    writeLightcast(lake, 28.5) // the out-of-band weekly Lightcast drop, v1
    val sources = Seq(
      IngestFlow.RestDataset("nyc_payroll_data", "synthetic://payroll",
        Seq("title_description", "base_salary", "pay_basis",
          "regular_gross_paid", "total_ot_paid", "total_other_pay",
          "fiscal_year"),
        pageSize = 2, maxPages = 8,
        fetcherClass = classOf[PayrollPageFetcher].getName),
      IngestFlow.RestDataset("nyc_job_postings_data", "synthetic://jobs",
        Seq("business_title", "salary_range_from", "salary_range_to",
          "posting_date", "post_until"),
        pageSize = 2, maxPages = 8,
        fetcherClass = classOf[JobsPageFetcher].getName))

    var afterTick1 = -1.0
    val n = Scheduler.run(spark, sources, lake,
      intervalMs = 1, maxTicks = 2, refresh = true, sleep = _ => (),
      afterTick = {
        case 1 =>
          afterTick1 = socMedian("Police Officers")
          writeLightcast(lake, 99.0) // next week's drop lands in the lake
        case _ => ()
      })
    assert(n == 2)
    // tick 1 built gold from v1; tick 2's refresh re-read the lake and
    // rebuilt gold from v2 — the weekly set-and-forget contract
    assert(afterTick1 == 28.5)
    assert(socMedian("Police Officers") == 99.0)
  }
}
