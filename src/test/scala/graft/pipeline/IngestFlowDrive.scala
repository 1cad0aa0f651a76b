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
    // lightcast arrives as a real XLSX workbook → lake parquet flow step
    val xlsx = java.nio.file.Files.createTempFile("lightcast", ".xlsx")
    LightcastXlsxFixture.write(xlsx)
    IngestFlow.ingestXlsx(spark, xlsx.toString,
      "lightcast_job_postings_data", lake)

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

    // re-ingestion: default sync keeps first ingestion (reference
    // semantics); refresh=true propagates the new lake artifact
    val s = spark
    import s.implicits._
    (1 to 9).map(i => Tuple1(s"t$i")).toDF("title_description")
      .write.mode("overwrite").parquet(s"$lake/nyc_payroll_data.parquet")
    IngestFlow.dbSync(spark, lake)
    println("bronze payroll after default re-sync: " +
      spark.table("bronze.nyc_payroll_data").count())
    IngestFlow.dbSync(spark, lake, refresh = true)
    println("bronze payroll after refresh re-sync: " +
      spark.table("bronze.nyc_payroll_data").count())

    // gold refresh: shrink bronze matches, default run stays stale,
    // refresh rebuilds from current bronze
    val m = spark.table("bronze.payroll_to_jobs_title_fuzzy_matches")
    val rows = m.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows.drop(1): _*), m.schema)
      .write.mode("overwrite")
      .saveAsTable("bronze.payroll_to_jobs_title_fuzzy_matches")
    IngestFlow.runGoldLayer(spark)
    println("gold rows after default re-run: " +
      spark.table("gold.nyc_salary_matches").count())
    IngestFlow.runGoldLayer(spark, refresh = true)
    println("gold rows after refresh re-run: " +
      spark.table("gold.nyc_salary_matches").count())
    spark.stop()
  }
}
