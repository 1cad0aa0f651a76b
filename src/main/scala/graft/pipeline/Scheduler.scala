package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Runnable scheduler binding for [[IngestFlow.runAll]] — the set-and-forget
  * deployment shell the reference gets from its three weekly Prefect crons
  * (/root/reference/src/data_ingestion.py:98-106, src/fuzzy_flows.py:16-23,
  * src/cleaned_data.py:48-56: ingestion Sunday 00:00, matching 01:00, gold
  * 02:00). The reference staggers three crons purely to SEQUENCE the
  * stages; `runAll` sequences them in-process, so one schedule drives the
  * whole chain and the 1-hour guard gaps disappear.
  *
  *   sbt "runMain graft.pipeline.Scheduler --every 7d --lake /data/lake"
  *
  * Source URLs come from the reference's own env pair
  * (`NYC_PAYROLL_DATA_API`, `NYC_JOB_POSTINGS_API`, data_ingestion.py:77-78).
  *
  * Semantics:
  *  - every tick runs `IngestFlow.runAll(refresh = true)`: re-ingested
  *    lake data propagates through bronze to gold — the reason a weekly
  *    schedule exists. `--refresh false` keeps the reference's literal
  *    CTAS-IF-NOT-EXISTS first-run-wins at bronze/gold (matches still
  *    overwrite, as the reference's flows do).
  *  - fixed-rate, anchored at start: ticks fire at start + k·interval,
  *    exactly like cron fires at wall-clock slots. A run that overruns
  *    its slot SKIPS the missed slots (no backlog of stacked runs) and
  *    the next run fires at the next grid point — the data a missed
  *    slot would have ingested is ingested then. This is the
  *    reference's own failure semantics: a Prefect weekly cron that
  *    overruns simply fires next week.
  *  - a failing tick logs and does not kill the schedule (the reference's
  *    cron fires again next week regardless).
  */
object Scheduler {

  /** "150ms" | "30s" | "10m" | "2h" | "7d" → milliseconds. */
  def parseInterval(s: String): Long = {
    val m = "^([0-9]+)(ms|s|m|h|d)$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(
        s"interval must be <n>(ms|s|m|h|d), got '$s'"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => n
      case "s" => n * 1000L
      case "m" => n * 60L * 1000L
      case "h" => n * 3600L * 1000L
      case "d" => n * 24L * 3600L * 1000L
    }
  }

  /** Fixed-rate loop: run `tick` at start + k·interval for up to `maxTicks`
    * firings (≤ 0 = forever). `sleep`/`now` are injectable for tests.
    * Cron semantics on overrun: missed grid slots are skipped, the next
    * run fires at the next grid point (never a backlog of stacked runs).
    * Returns ticks run. */
  def loop(intervalMs: Long, maxTicks: Int,
      sleep: Long => Unit = Thread.sleep,
      now: () => Long = () => System.currentTimeMillis())(
      tick: Int => Unit): Int = {
    require(intervalMs > 0, s"interval must be positive, got $intervalMs ms")
    val start = now()
    var n = 0
    var continue = true
    while (continue && (maxTicks <= 0 || n < maxTicks)) {
      tick(n + 1)
      n += 1
      if (maxTicks <= 0 || n < maxTicks) {
        // next grid slot strictly after "now" — missed slots are skipped,
        // not queued; max(n, …) keeps an instant tick from re-firing
        // inside its own slot
        val elapsedSlots = (now() - start) / intervalMs + 1
        val next = start + math.max(n.toLong, elapsedSlots) * intervalMs
        val wait = next - now()
        if (wait > 0) sleep(wait)
      }
    }
    n
  }

  /** Drive the full chain on a schedule. `afterTick` is an observability /
    * test hook invoked after each completed run. Returns ticks run. */
  def run(spark: SparkSession, sources: Seq[IngestFlow.RestDataset],
      lakeDir: String, intervalMs: Long, maxTicks: Int,
      refresh: Boolean = true,
      sleep: Long => Unit = Thread.sleep,
      afterTick: Int => Unit = _ => ()): Int = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    loop(intervalMs, maxTicks, sleep) { n =>
      log.info(s"Scheduler tick $n: runAll(refresh=$refresh) → $lakeDir")
      try {
        IngestFlow.runAll(spark, sources, lakeDir, refresh)
        afterTick(n)
      } catch {
        case scala.util.control.NonFatal(e) =>
          // the next tick still fires — cron semantics, not fail-stop
          log.error(s"Scheduler tick $n failed: ${e.getMessage}", e)
      }
    }
  }

  private def opt(args: Array[String], key: String): Option[String] = {
    if (args.lastOption.contains(key)) throw new IllegalArgumentException(
      s"$key expects a value")
    args.sliding(2).collectFirst {
      case Array(`key`, v) =>
        // a flag missing its value would otherwise swallow the NEXT flag
        // as its value ("--lake --every 7d" → lake="--every"): error out
        if (v.startsWith("--")) throw new IllegalArgumentException(
          s"$key expects a value, got flag '$v' — did you omit the value?")
        v
    }
  }

  def main(args: Array[String]): Unit = {
    val intervalMs = parseInterval(opt(args, "--every").getOrElse("7d"))
    val lakeDir = opt(args, "--lake")
      .orElse(sys.env.get("GRAFT_LAKE_DIR"))
      .getOrElse(throw new IllegalArgumentException(
        "pass --lake <dir> (or set GRAFT_LAKE_DIR)"))
    val maxTicks = opt(args, "--ticks").fold(0)(_.toInt)
    val refresh = opt(args, "--refresh").fold(true)(_.toBoolean)
    // per-source fetcher overrides keep the main drivable where HTTP is
    // not (air-gapped smoke runs, canned replay fetchers); a canned
    // fetcher never dereferences the URL, so the env var is only
    // REQUIRED for the default HTTP fetcher
    val httpFetcher = classOf[graft.sources.HttpJsonPageFetcher].getName
    def source(env: String, fetcherArg: String): (String, String) = {
      val fetcher = opt(args, fetcherArg).getOrElse(httpFetcher)
      val u = sys.env.get(env).getOrElse {
        if (fetcher == httpFetcher) throw new IllegalArgumentException(
          s"set $env to the Socrata JSON endpoint (reference " +
            "data_ingestion.py:77-78 reads the same variables)")
        else s"synthetic://${env.toLowerCase}"
      }
      (u, fetcher)
    }
    val (payrollUrl, payrollFetcher) =
      source("NYC_PAYROLL_DATA_API", "--payroll-fetcher")
    val (jobsUrl, jobsFetcher) =
      source("NYC_JOB_POSTINGS_API", "--jobs-fetcher")
    val sources = Seq(
      IngestFlow.RestDataset("nyc_payroll_data", payrollUrl,
        Seq("title_description", "base_salary", "pay_basis",
          "regular_gross_paid", "total_ot_paid", "total_other_pay",
          "fiscal_year"),
        fetcherClass = payrollFetcher),
      IngestFlow.RestDataset("nyc_job_postings_data", jobsUrl,
        Seq("business_title", "salary_range_from", "salary_range_to",
          "posting_date", "post_until"),
        fetcherClass = jobsFetcher))
    val spark = graft.Sessions.local("graft-scheduler")
    try {
      val n = run(spark, sources, lakeDir, intervalMs, maxTicks, refresh)
      println(s"Scheduler finished after $n tick(s)")
    } finally spark.stop()
  }
}
