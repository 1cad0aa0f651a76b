package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkTestBase

/** [[Tables.events]] must normalize `ts` to TimestampType across BOTH
  * encodings the driver's testdata generations have used: nano-longs
  * (TIMESTAMP(NANOS) read under `nanosAsLong`, or a plain int64 column)
  * and native timestamp[us]. The round-6→7 regen silently switched
  * encodings and took all six events-based queries down at bench time —
  * this pins the contract so the next switch fails in `sbt test`. */
class TablesSpec extends SparkTestBase {

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-tables-spec").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events ts arrives as TimestampType for native timestamp parquet") {
    val dir = writeEvents(
      spark.range(3).select(col("id").as("event_id"),
        to_timestamp(lit("2024-01-02 03:04:05.123456")).as("ts")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
  }

  test("events ts arrives as TimestampType for nano-long parquet, exactly") {
    // 2024-01-02 03:04:05.123456 UTC as nanoseconds since epoch — the
    // shape a TIMESTAMP(NANOS) column takes under nanosAsLong
    val nanos = 1704164645123456000L
    val dir = writeEvents(
      spark.range(1).select(col("id").as("event_id"), lit(nanos).as("ts")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
  }

  test("real testdata events reads with a timestamp ts at sf0.001") {
    val got = Tables.events(spark, sf())
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.count() > 0)
  }
}
