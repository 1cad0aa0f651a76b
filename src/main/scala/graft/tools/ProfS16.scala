package graft.tools

// why is s16 (report from MAINTAINED postings) slower than c28 (same
// report from scratch postings)? stage-by-stage timing at SPARK_GRAFT_SF_DIR.
object ProfS16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-s16", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val mode = args.headOption.getOrElse("index")
    def source(): org.apache.spark.sql.DataFrame = mode match {
      case "index" =>
        val p = t("stream build (IndexMemo)") {
          graft.queries.StreamQueries.streamSemanticPath(spark, sfDir)
        }
        graft.pipeline.SilverIndex.postingsIndex(spark, p)
      case _ =>
        graft.operators.TextSearch.postings(
          graft.queries.CurationQueries.semanticUnion(spark, sfDir),
          "id", "text")
    }
    (1 to 3).foreach { i =>
      t(s"report from $mode, noop $i") {
        noop(graft.queries.CurationQueries
          .semanticReportFromPostings(spark, sfDir, source()))
      }
    }
    if (mode == "index") (1 to 3).foreach { i =>
      t(s"report from $mode+repart, noop $i") {
        noop(graft.queries.CurationQueries.semanticReportFromPostings(
          spark, sfDir,
          source().repartition(32, org.apache.spark.sql.functions.col("doc"))))
      }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/s16_from_$mode.plan"),
      graft.queries.CurationQueries
        .semanticReportFromPostings(spark, sfDir, source())
        .queryExecution.executedPlan.toString)
    println(s"[prof] plan written to /tmp/s16_from_$mode.plan")
    spark.stop()
  }
}
