package graft.pipeline

// scratch end-to-end drive for /verify: cold warehouse, whole flow chain,
// then page gold over HTTP-free Serve. Run:
//   sbt -batch "Test/runMain graft.pipeline.IngestFlowDrive"
object IngestFlowDrive {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = graft.Sessions.builder("ingest-drive", Some("local[4]"), 4)
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

    println("gold tables: " + spark.sql("SHOW TABLES IN gold").collect().mkString(", "))
    println("salary_matches rows: " + spark.table("gold.nyc_salary_matches").count())
    spark.table("gold.nyc_salary_matches").show(20, truncate = false)
    println("serve page: " +
      graft.serve.Serve.fetchJson(spark, 0, 0, 3).mkString("\n"))
    spark.stop()
  }
}
