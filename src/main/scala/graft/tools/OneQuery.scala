package graft.tools

/** Query-subset slice of [[graft.Verify]] for fast gate iteration:
  * writes `outDir/<name>.parquet` plus `outDir/oracle_sql.json` holding
  * just these queries' oracles (when they exist), so
  * `tools/one_check.py` / `tools/oracle_check.py --no-verify` can
  * replay the driver's DuckDB compare on a handful of queries without
  * running the whole battery. Comma-separate to share one JVM:
  *
  *   sbt -batch "runMain graft.tools.OneQuery c16_bpe_export,q20_dq_checks \
  *     /root/testdata/sf0.01 /tmp/graft_one"
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(nameArg, sfDir, outDir) = args
    val names = nameArg.split(',').toSeq
    val spark = graft.Sessions.local("one-query",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    names.foreach { name =>
      graft.SparkEntry.hashedQuery(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"wrote $outDir/$name")
    }
    val sql = names.flatMap(name =>
      graft.SparkEntry.oracleSql.get(name).map(s =>
        s""""$name": ${ujsonEscape(s)}"""))
      .mkString(",")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"{$sql}")
    spark.stop()
  }

  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
