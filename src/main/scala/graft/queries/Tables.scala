package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * scale-factor dir. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's reader rejects; read them as nano-longs and convert exactly
    * (integer division — the data is whole-microsecond). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
