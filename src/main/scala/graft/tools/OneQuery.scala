package graft.tools

/** Single-query slice of [[graft.Verify]] for fast gate iteration:
  * writes `outDir/<name>.parquet` plus `outDir/oracle_sql.json` holding
  * just this query's oracle (when one exists), so
  * `tools/one_check.py` can replay the driver's DuckDB compare on one
  * query without running the whole battery.
  *
  *   sbt -batch "runMain graft.tools.OneQuery c16_bpe_export \
  *     /root/testdata/sf0.01 /tmp/graft_one"
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.Sessions.local("one-query",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    graft.SparkEntry.hashedQuery(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = graft.SparkEntry.oracleSql.get(name).map { s =>
      s""""$name": ${ujsonEscape(s)}"""
    }.getOrElse("")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"{$sql}")
    println(s"wrote $outDir/$name")
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
