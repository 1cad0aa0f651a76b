package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same conf applies —
  * shuffle partitioning is sized by the driver env, AQE re-plans at runtime
  * (skew-join splitting matters: title frequency in the reference workload is
  * highly skewed — single titles match 157k payroll rows,
  * /root/reference/logs/application.log.1).
  */
object Sessions {
  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // filter-less count()/min/max over parquet answer from footer
      // metadata instead of scanning row groups — the incremental-index
      // refreshes (SilverIndex) fall back to counting their tables when
      // the row-count sidecar is stale, and at 10¹¹ indexed rows a
      // footer read is the difference between a metadata op and a table
      // scan. GLOBAL-SCOPE CAVEAT (r7 advice): float/double footer
      // min/max written by SOME older parquet writers misorder NaN, so
      // a filter-less min/max over foreign files could answer from bad
      // stats. Accepted here because (a) every lake table this engine
      // ships queries against is written by Spark 4 (statistics
      // NaN-correct), and (b) the entire 70-query gate — including the
      // filter-less scalar-agg oracles — is DuckDB-verified under this
      // flag every round (CORRECTNESS_r{N}), so a stats-vs-scan
      // divergence cannot land silently. Unset it per-session when
      // pointing graft at parquet of unknown provenance.
      .config("spark.sql.parquet.aggregatePushdown", "true")
    master.fold(b)(m => b.master(m))
  }

  /** Local session for tests and benches. */
  def local(appName: String = "graft",
            cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = builder(appName, Some(s"local[$cores]"), math.max(cores, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    spark
  }
}
