package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class SessionsSpec extends SparkTestBase {

  /** µs-precision construction — Timestamp(ms) would truncate the
    * sub-ms boundary the exact-gap case exercises. */
  private def tsUs(us: Long): Timestamp = {
    val t = new Timestamp((us / 1000000L) * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def run(rows: Seq[(Long, Long, Long)], gapUs: Long) = {
    val s = spark
    import s.implicits._
    val df = rows.map { case (u, usec, id) => (u, tsUs(usec), id) }
      .toDF("user_id", "ts", "event_id")
    Sessions.sessionize(df, "user_id", "ts", "event_id", gapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getLong(5)))).toMap
  }

  test("hand-computed sessions: exact-gap stays, greater-than splits") {
    val gap = 1000000L // 1 s
    val rows = Seq(
      (1L, 0L, 1L),
      (1L, 1000000L, 2L),        // gap == 1s: SAME session
      (1L, 2000001L, 3L),        // gap 1.000001s: NEW session
      (1L, 2500000L, 4L),        // same session as 3
      (2L, 0L, 5L))              // other user: independent
    val got = run(rows, gap)
    assert(got == Map(
      (1L, 1L) -> ((2L, 1000000L)),
      (1L, 2L) -> ((2L, 499999L)),
      (2L, 1L) -> ((1L, 0L))), got.toString)
  }

  test("session_idx is 1-based and contiguous in time order") {
    val gap = 1000L
    val rows = (0L until 5L).map(i => (7L, i * 10000L, i)) // all split
    val got = run(rows, gap)
    assert(got.keySet == (1L to 5L).map(i => (7L, i)).toSet)
    got.values.foreach { case (n, d) => assert(n == 1L && d == 0L) }
  }

  test("equal timestamps order by the tie column, null user/ts drop") {
    val s = spark
    import s.implicits._
    // two events at the SAME instant then one 2s later: one boundary
    val df = Seq(
      (Option(1L), Option(new Timestamp(0L)), 2L),
      (Option(1L), Option(new Timestamp(0L)), 1L),
      (Option(1L), Option(new Timestamp(2000L)), 3L),
      (None: Option[Long], Option(new Timestamp(0L)), 4L),
      (Option(1L), None: Option[Timestamp], 5L))
      .toDF("user_id", "ts", "event_id")
    val got = Sessions.sessionize(df, "user_id", "ts", "event_id",
        gapMicros = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(got == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L), got.toString)
  }

  test("gap guard") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, new Timestamp(0L), 1L))
      .toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException](
      Sessions.sessionize(df, "user_id", "ts", "event_id", 0L))
  }
}
