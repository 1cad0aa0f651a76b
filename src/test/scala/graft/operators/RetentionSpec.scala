package graft.operators

import graft.SparkTestBase

class RetentionSpec extends SparkTestBase {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  // 2024-01-01, -08, -15, -22 are Mondays (weeks W0..W3)
  private def run(rows: Seq[(java.lang.Long, String)])
      : Map[(String, Int), Long] = {
    val s = spark
    import s.implicits._
    val df = rows.map { case (u, t) =>
      (u, if (t == null) null else ts(t))
    }.toDF("user_id", "ts")
    Retention.weeklyCohorts(df, "user_id", "ts")
      .collect().map { r =>
        (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
          r.getInt(1)) -> r.getLong(2)
      }.toMap
  }

  test("hand-computed cohort matrix; offset 0 is the cohort size") {
    val got = run(Seq(
      // A: cohort W0, active W0 (twice — distinct once) and W1
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 09:00:00"),
      (1L, "2024-01-08 12:00:00"),
      // B: cohort W0 only
      (2L, "2024-01-05 23:59:59"),
      // C: cohort W1, returns at W3 (offset 2, skipping W2)
      (3L, "2024-01-10 00:00:00"), (3L, "2024-01-22 07:00:00")))
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      // A's W1 activity lands in COHORT W0 offset 1, not cohort W1
      ("2024-01-08", 0) -> 1L, ("2024-01-08", 2) -> 1L))
  }

  test("weeks truncate to Monday: Sunday and next-Monday split cohorts") {
    val got = run(Seq(
      (1L, "2024-01-07 23:00:00"),   // Sunday -> week of 2024-01-01
      (2L, "2024-01-08 00:00:00")))  // Monday -> week of 2024-01-08
    assert(got == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-08", 0) -> 1L))
  }

  test("null users and timestamps drop") {
    val got = run(Seq(
      (1L, "2024-01-01 10:00:00"),
      (null.asInstanceOf[java.lang.Long], "2024-01-01 11:00:00"),
      (2L, null)))
    assert(got == Map(("2024-01-01", 0) -> 1L))
  }
}
