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
  *   sbt "runMain graft.pipeline.Scheduler --cron \"0 0 * * 0\" --lake /data/lake"
  *
  * `--every` is a fixed-rate grid anchored at launch; `--cron` (with
  * optional `--tz Area/City`, default UTC) anchors ticks to wall-clock
  * slots exactly like the reference's Prefect schedules — see [[Cron]].
  * The two are mutually exclusive.
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

  /** Wall-clock grid loop: run `tick` at each [[Cron]] slot (in `zone`) for
    * up to `maxTicks` firings (≤ 0 = forever) — the reference's Prefect
    * `cron="0 0 * * 0"` anchor, vs [[loop]]'s launch-anchored grid. The
    * first tick WAITS for the first slot (cron never fires at submit
    * time). Overrun collapse falls out of [[Cron.nextFire]]'s
    * strictly-after contract: a run that blows through its slot asks for
    * the next slot after NOW, so missed slots are skipped, never stacked.
    * Returns ticks run. */
  def loopCron(cron: Cron, maxTicks: Int,
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
      sleep: Long => Unit = Thread.sleep,
      now: () => Long = () => System.currentTimeMillis())(
      tick: Int => Unit): Int = {
    var n = 0
    while (maxTicks <= 0 || n < maxTicks) {
      val next = cron.nextFire(now(), zone)
      // re-check after waking: Thread.sleep may undershoot, and an
      // injected test clock advances exactly — either way fire only once
      // the slot is reached
      var wait = next - now()
      while (wait > 0) { sleep(wait); wait = next - now() }
      tick(n + 1)
      n += 1
    }
    n
  }

  private def tickBody(spark: SparkSession,
      sources: Seq[IngestFlow.RestDataset], lakeDir: String,
      refresh: Boolean, afterTick: Int => Unit): Int => Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    n => {
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

  /** Drive the full chain on a fixed-rate schedule. `afterTick` is an
    * observability / test hook invoked after each completed run. Returns
    * ticks run. */
  def run(spark: SparkSession, sources: Seq[IngestFlow.RestDataset],
      lakeDir: String, intervalMs: Long, maxTicks: Int,
      refresh: Boolean = true,
      sleep: Long => Unit = Thread.sleep,
      afterTick: Int => Unit = _ => ()): Int =
    loop(intervalMs, maxTicks, sleep)(
      tickBody(spark, sources, lakeDir, refresh, afterTick))

  /** Drive the full chain on a wall-clock cron grid — the reference's
    * literal deployment shape (`0 0 * * 0`). Returns ticks run. */
  def runCron(spark: SparkSession, sources: Seq[IngestFlow.RestDataset],
      lakeDir: String, cron: Cron, maxTicks: Int,
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
      refresh: Boolean = true,
      sleep: Long => Unit = Thread.sleep,
      now: () => Long = () => System.currentTimeMillis(),
      afterTick: Int => Unit = _ => ()): Int =
    loopCron(cron, maxTicks, zone, sleep, now)(
      tickBody(spark, sources, lakeDir, refresh, afterTick))

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
    val cronSpec = opt(args, "--cron").map(Cron.parse)
    val every = opt(args, "--every")
    require(cronSpec.isEmpty || every.isEmpty,
      "--cron and --every are mutually exclusive schedules")
    val zone = opt(args, "--tz").map(java.time.ZoneId.of)
      .getOrElse(java.time.ZoneOffset.UTC)
    val intervalMs = parseInterval(every.getOrElse("7d"))
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
      val n = cronSpec match {
        case Some(c) =>
          runCron(spark, sources, lakeDir, c, maxTicks, zone, refresh)
        case None =>
          run(spark, sources, lakeDir, intervalMs, maxTicks, refresh)
      }
      println(s"Scheduler finished after $n tick(s)")
    } finally spark.stop()
  }
}
