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

  // ---- wall-clock cron grid (VERDICT r5 task 5: the reference anchors at
  // wall-clock slots — data_ingestion.py:98-106 cron "0 0 * * 0" — not
  // "every 7d from launch")

  private val utc = java.time.ZoneOffset.UTC
  private def ms(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  test("cron parse + nextFire: the reference's Sunday-midnight schedule") {
    val c = Cron.parse("0 0 * * 0")
    // 2026-08-12 is a Wednesday; next Sunday 00:00 UTC is 08-16
    assert(c.nextFire(ms("2026-08-12T10:30:00Z"), utc) ==
      ms("2026-08-16T00:00:00Z"))
    // strictly after: asking from exactly ON the slot yields NEXT week
    assert(c.nextFire(ms("2026-08-16T00:00:00Z"), utc) ==
      ms("2026-08-23T00:00:00Z"))
    // mid-minute of the slot also advances a full week (minute granularity)
    assert(c.nextFire(ms("2026-08-16T00:00:30Z"), utc) ==
      ms("2026-08-23T00:00:00Z"))
    // dow 7 is Sunday too
    assert(Cron.parse("0 0 * * 7").nextFire(ms("2026-08-12T10:30:00Z"), utc) ==
      ms("2026-08-16T00:00:00Z"))
    // and the staggered siblings land an hour apart, same day
    assert(Cron.parse("0 1 * * 0").nextFire(ms("2026-08-16T00:00:00Z"), utc) ==
      ms("2026-08-16T01:00:00Z"))
  }

  test("cron steps, lists, ranges, and the dom/dow OR rule") {
    val q = Cron.parse("*/15 * * * *")
    assert(q.nextFire(ms("2026-08-12T10:07:00Z"), utc) ==
      ms("2026-08-12T10:15:00Z"))
    assert(q.nextFire(ms("2026-08-12T10:45:00Z"), utc) ==
      ms("2026-08-12T11:00:00Z"))
    val lunch = Cron.parse("30 12 1-5 * *")
    assert(lunch.nextFire(ms("2026-08-12T10:00:00Z"), utc) ==
      ms("2026-09-01T12:30:00Z"))
    // vixie OR rule: dom 13 OR Friday — Thu 08-13 matches by dom, then
    // Fri 08-14 matches by dow
    val or = Cron.parse("0 0 13 * 5")
    assert(or.nextFire(ms("2026-08-12T10:00:00Z"), utc) ==
      ms("2026-08-13T00:00:00Z"))
    assert(or.nextFire(ms("2026-08-13T00:00:00Z"), utc) ==
      ms("2026-08-14T00:00:00Z"))
    // a restricted dom with a star dow is AND (dow star matches all)
    val dom = Cron.parse("0 0 13 * *")
    assert(dom.nextFire(ms("2026-08-13T00:00:00Z"), utc) ==
      ms("2026-09-13T00:00:00Z"))
    // comma list
    val lst = Cron.parse("0 6,18 * * *")
    assert(lst.nextFire(ms("2026-08-12T07:00:00Z"), utc) ==
      ms("2026-08-12T18:00:00Z"))
    // vixie star-by-first-char: "*/2" in dow is a STAR field — it filters
    // (AND) but does not arm the dom/dow OR rule. From Nov 1 2026
    // (a Sunday, dow 0 ∈ {0,2,4,6}): the OR rule would fire Nov 3, and
    // plain dom-13 would fire Nov 13 (a Friday, dow 5 ∉ set) — the
    // correct AND of both waits for Dec 13 (a Sunday).
    val step = Cron.parse("0 0 13 * */2")
    assert(step.nextFire(ms("2026-11-01T10:00:00Z"), utc) ==
      ms("2026-12-13T00:00:00Z"))
    // cronie bare-value step: "30/10" = from 30 to max by 10
    val fromStep = Cron.parse("30/10 * * * *")
    assert(fromStep.nextFire(ms("2026-08-12T10:31:00Z"), utc) ==
      ms("2026-08-12T10:40:00Z"))
    assert(fromStep.nextFire(ms("2026-08-12T10:51:00Z"), utc) ==
      ms("2026-08-12T11:30:00Z"))
    // explicit zone: 00:00 in UTC+2 is 22:00 UTC the previous day
    assert(Cron.parse("0 0 * * 0").nextFire(ms("2026-08-12T10:00:00Z"),
      java.time.ZoneOffset.ofHours(2)) == ms("2026-08-15T22:00:00Z"))
  }

  test("cron garbage rejected") {
    intercept[IllegalArgumentException](Cron.parse("0 0 * *")) // 4 fields
    intercept[IllegalArgumentException](Cron.parse("60 * * * *"))
    intercept[IllegalArgumentException](Cron.parse("* 24 * * *"))
    intercept[IllegalArgumentException](Cron.parse("* * 0 * *"))
    intercept[IllegalArgumentException](Cron.parse("* * * 13 *"))
    intercept[IllegalArgumentException](Cron.parse("* * * * 8"))
    intercept[IllegalArgumentException](Cron.parse("5-1 * * * *"))
    intercept[IllegalArgumentException](Cron.parse("*/0 * * * *"))
    intercept[IllegalArgumentException](Cron.parse("x * * * *"))
  }

  test("loopCron fires on wall-clock slots; overruns skip, never stack") {
    val c = Cron.parse("0 * * * *") // hourly, on the hour
    var t = ms("2026-08-12T10:30:00Z") // launch mid-slot
    val firedAt = ArrayBuffer[Long]()
    val n = Scheduler.loopCron(c, 4, utc,
      sleep = d => t += d, now = () => t) { i =>
      firedAt += t
      if (i == 2) t += 90 * 60 * 1000L // 90-min overrun blows through 13:00
    }
    assert(n == 4)
    // first tick WAITS for the first slot (11:00); tick 2 at 12:00 ends
    // 13:30 so the 13:00 slot is skipped and tick 3 fires at 14:00
    assert(firedAt.toSeq == Seq(ms("2026-08-12T11:00:00Z"),
      ms("2026-08-12T12:00:00Z"), ms("2026-08-12T14:00:00Z"),
      ms("2026-08-12T15:00:00Z")))
  }

  test("runCron drives ticks on the grid and tolerates failures") {
    val broken = Seq(IngestFlow.RestDataset("nope", "synthetic://x",
      Seq("f"), fetcherClass = "does.not.Exist"))
    var t = ms("2026-08-12T10:30:00Z")
    val n = Scheduler.runCron(spark, broken, "/tmp/graft-sched-void",
      Cron.parse("0 0 * * 0"), maxTicks = 2,
      sleep = d => t += d, now = () => t)
    assert(n == 2)
    assert(t == ms("2026-08-23T00:00:00Z")) // two Sunday slots consumed
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
