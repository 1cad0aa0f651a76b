package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class BurstSpec extends SparkTestBase {

  private val H = 3600L * 1000 // one hour in ms

  /** n events of `etype` inside hour-bucket `hourIdx`. */
  private def burstRows(etype: String, hourIdx: Int, n: Int)
      : Seq[(String, Timestamp)] =
    (0 until n).map(i =>
      (etype, new Timestamp(hourIdx * H + i * 1000L)))

  private def run(rows: Seq[(String, Timestamp)]) = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("event_type", "ts")
    Burst.hourlyBursts(df, "event_type", "ts",
        trailingHours = 24, threshold = 2.0)
      .collect().map { r =>
        val ratio = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        (r.getString(0), r.getTimestamp(1).getTime / H) ->
          ((r.getLong(2), ratio, r.getLong(5)))
      }.toMap
  }

  test("hand-computed: 4x spike flags, steady hours don't, first hour NULL") {
    val rows = burstRows("view", 0, 10) ++ burstRows("view", 1, 10) ++
      burstRows("view", 2, 10) ++ burstRows("view", 3, 40)
    val got = run(rows)
    assert(got(("view", 0L)) == ((10L, None, 0L)), got.toString)
    assert(got(("view", 1L)) == ((10L, Some(1.0), 0L)))
    assert(got(("view", 2L)) == ((10L, Some(1.0), 0L)))
    assert(got(("view", 3L)) == ((40L, Some(4.0), 1L)))
  }

  test("exactly-threshold flags (>=); just-under doesn't") {
    val rows = burstRows("a", 0, 10) ++ burstRows("a", 1, 20) ++
      burstRows("b", 0, 10) ++ burstRows("b", 1, 19)
    val got = run(rows)
    assert(got(("a", 1L))._3 == 1L, got.toString)
    assert(got(("b", 1L))._3 == 0L, got.toString)
  }

  test("ROWS frame: calendar gaps don't dilute the baseline") {
    // hours 0 and 5 observed; hour 5's baseline is hour 0's count
    // alone (one OBSERVED bucket), not a gap-diluted mean over 5 hours
    val rows = burstRows("v", 0, 10) ++ burstRows("v", 5, 30)
    val got = run(rows)
    assert(got(("v", 5L)) == ((30L, Some(3.0), 1L)), got.toString)
  }

  test("types are independent; null type/ts drop") {
    val s = spark
    import s.implicits._
    val rows = burstRows("a", 0, 5) ++ burstRows("b", 0, 50)
    val df = (rows.map { case (e, t) => (Option(e), Option(t)) } :+
      ((None: Option[String], Option(new Timestamp(0L)))) :+
      ((Option("a"), None: Option[Timestamp])))
      .toDF("event_type", "ts")
    val got = Burst.hourlyBursts(df, "event_type", "ts", 24, 2.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 5L, "b" -> 50L), got.toString)
  }

  test("parameter guards") {
    val s = spark
    import s.implicits._
    val df = burstRows("a", 0, 1).toDF("event_type", "ts")
    intercept[IllegalArgumentException](
      Burst.hourlyBursts(df, "event_type", "ts", 0, 2.0))
    intercept[IllegalArgumentException](
      Burst.hourlyBursts(df, "event_type", "ts", 24, 0.0))
    intercept[IllegalArgumentException](
      Burst.hourlyBursts(df, "event_type", "ts", 24,
        Double.PositiveInfinity))
  }
}
