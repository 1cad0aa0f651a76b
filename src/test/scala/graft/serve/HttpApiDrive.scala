package graft.serve

import graft.pipeline.{IngestFlow, JobsPageFetcher, PayrollPageFetcher}

// scratch drive for /verify: full ingest chain then a live HTTP server on
// :18432 for 60 s, so an external client (curl) can hit every endpoint.
//   sbt -batch "Test/runMain graft.serve.HttpApiDrive"
object HttpApiDrive {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = graft.Sessions.builder("http-drive", Some("local[4]"), 4)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)

    val lake = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val s = spark
    import s.implicits._
    Seq(("Software Developers", 12000, 35.0), ("Police Officers", 4000, 28.5))
      .toDF("Occupation (SOC)", "Total Postings (Jan 2024 - Jun 2025)",
        "Median Posting Duration")
      .write.parquet(s"$lake/lightcast_job_postings_data.parquet")

    IngestFlow.runAll(spark,
      Seq(
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
          fetcherClass = classOf[JobsPageFetcher].getName)),
      lake)

    val api = HttpApi.start(spark, port = 18432)
    println(s"SERVING on ${api.port}")
    Thread.sleep(60000)
    api.stop()
    spark.stop()
  }
}
