package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * scale-factor dir. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` encoding has varied across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects without
    * `nanosAsLong`) and plain timestamp[us] (no tz → TIMESTAMP_NTZ).
    * Normalize both to session-local TimestampType — the session runs in
    * UTC, so the NTZ→LTZ cast is value-preserving and the DuckDB oracle
    * (tz-naive) sees identical instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")) // nano-long → whole micros
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
}
