package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkTestBase {

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private def run(rows: Seq[(Long, String, Int)])
      : Map[Long, (Option[Int], Option[Int], Option[Int], Int)] = {
    val s = spark
    import s.implicits._
    val df = rows.map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "ts")
    Funnel.earliestCompletion(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map { r =>
        def m(i: Int): Option[Int] = Option(r.getTimestamp(i))
          .map(t => t.toLocalDateTime.getMinute)
        r.getLong(0) -> ((m(1), m(2), m(3), r.getInt(4)))
      }.toMap
  }

  test("greedy-earliest chain; pre-step-1 events are ignored") {
    val got = run(Seq(
      // A: clean 3-step chain
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),
      // B: click BEFORE the first view must not count; later click does
      (2L, "click", 1), (2L, "view", 2), (2L, "click", 5),
      // C: view only
      (3L, "view", 4),
      // D: purchase exists but precedes the view — and no click at all,
      // so the chain stalls at step 1 regardless
      (4L, "purchase", 1), (4L, "view", 2),
      // E: no view at all -> no row
      (5L, "click", 1), (5L, "purchase", 2)))
    assert(got == Map(
      1L -> ((Some(1), Some(2), Some(3), 3)),
      2L -> ((Some(2), Some(5), None, 2)),
      3L -> ((Some(4), None, None, 1)),
      4L -> ((Some(2), None, None, 1))))
  }

  test("same-timestamp transitions count (at-or-after), and earliest wins") {
    val got = run(Seq(
      (1L, "view", 3), (1L, "click", 3), (1L, "purchase", 3),
      // multiple candidates: earliest valid click (4) then earliest
      // purchase at/after it (6), not the later click at 7
      (2L, "view", 2), (2L, "click", 4), (2L, "click", 7),
      (2L, "purchase", 6)))
    assert(got == Map(
      1L -> ((Some(3), Some(3), Some(3), 3)),
      2L -> ((Some(2), Some(4), Some(6), 3))))
  }

  test("latencyQuantiles: rank-exact durations, incomplete funnels excluded") {
    val s = spark
    import s.implicits._
    // four completing users with durations 10, 20, 30, 40 min; one
    // stalled user (no purchase) that must not enter the distribution
    val rows = (1 to 4).flatMap(u => Seq(
      (u.toLong, "view", ts(0)), (u.toLong, "click", ts(1)),
      (u.toLong, "purchase", ts(u * 10)))) ++
      Seq((9L, "view", ts(0)), (9L, "click", ts(5)))
    val df = rows.toDF("user_id", "event_type", "ts")
    val got = Funnel.latencyQuantiles(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), qs = Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // n=4: p50 -> rank ceil(2.0)=2 -> 20 min; p100 -> rank 4 -> 40 min
    assert(got == Map(
      0.5 -> ((4L, 20L * 60 * 1000000)),
      1.0 -> ((4L, 40L * 60 * 1000000))))
    intercept[IllegalArgumentException] {
      Funnel.latencyQuantiles(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), qs = Seq(0.0))
    }
  }

  test("prefix-monotone: adding later events never moves earlier steps") {
    val base = Seq((1L, "view", 1), (1L, "click", 3))
    val more = base ++ Seq((1L, "view", 0), (1L, "purchase", 5))
    val a = run(base)(1L)
    val b = run(more)(1L)
    // the earlier view at minute 0 legitimately moves t1; but with the
    // ORIGINAL t1 kept (events strictly after), steps only extend
    assert(a._1 == Some(1) && a._2 == Some(3) && a._4 == 2)
    assert(b == ((Some(0), Some(3), Some(5), 3)))
  }
}
