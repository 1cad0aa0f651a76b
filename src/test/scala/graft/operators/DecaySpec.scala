package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

import java.sql.Timestamp

class DecaySpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("half-life weights: exact powers of two, day-granular ages") {
    val s = spark
    import s.implicits._
    // reference date = 2024-03-01 (corpus max). Ages: 0d, 6d (same
    // half-life bucket 0), 7d (bucket 1 → 0.5), 70d (bucket 10)
    val df = Seq(
      (1L, "click", ts("2024-03-01 10:00:00")),
      (1L, "click", ts("2024-02-24 23:59:59")), // 6 days → weight 1.0
      (1L, "click", ts("2024-02-23 00:00:01")), // 7 days → weight 0.5
      (2L, "view", ts("2023-12-22 12:00:00")))  // 70 days → 2^-10
      .toDF("user_id", "event_type", "ts")
    val got = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(got((1L, "click")) == ((3L, 0, 2.5)))
    assert(got((2L, "view")) == ((1L, 70, math.pow(2.0, -10))))
  }

  test("cap: ancient events weigh 2^-30, never underflow to drift") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "click", ts("2024-03-01 00:00:00")),
      (1L, "click", ts("1994-03-01 00:00:00"))) // ~30 years: capped
      .toDF("user_id", "event_type", "ts")
    val score = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7)
      .collect().head.getDouble(4)
    // exactly 1 + 2^-30 — representable and order-free
    assert(score == 1.0 + math.pow(2.0, -30))
  }

  test("score is partition-order-free (exact sum)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 500).map(i =>
      (1L, "click", new Timestamp(
        ts("2024-03-01 00:00:00").getTime - i.toLong * 86400000L)))
    val df = rows.toDF("user_id", "event_type", "ts")
    val a = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7)
      .collect().head.getDouble(4)
    val b = Decay.halfLifeScores(
        df.repartition(17, org.apache.spark.sql.functions.col("ts")),
        "user_id", "event_type", "ts", 7)
      .collect().head.getDouble(4)
    val expected = (0 until 500)
      .map(i => math.pow(2.0, -math.min(i / 7, 30))).sum
    assert(a == b)
    assert(a == expected)
  }

  test("parameter guard") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "c", ts("2024-03-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Decay.halfLifeScores(df, "user_id", "event_type", "ts", 0)
    }
    intercept[IllegalArgumentException] {
      Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7,
        maxExactEvents = 0L)
    }
  }

  test("exact-replay bound is ENFORCED: a group at maxExactEvents raises") {
    val s = spark
    import s.implicits._
    val rows = (0 until 5).map(i =>
      (1L, "click", new Timestamp(
        ts("2024-03-01 00:00:00").getTime - i.toLong * 86400000L))) :+
      ((2L, "view", ts("2024-03-01 00:00:00")))
    val df = rows.toDF("user_id", "event_type", "ts")
    // the hot group (5 events) trips a bound of 5; the cold group alone
    // is fine — the guard is per group, not global
    val e = intercept[Exception] {
      Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7,
        maxExactEvents = 5L).collect()
    }
    assert(e.getMessage.contains("exact-replay") ||
      Option(e.getCause).exists(_.getMessage.contains("exact-replay")))
    val ok = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7,
      maxExactEvents = 6L).collect()
    assert(ok.length == 2)
    // and the explicit opt-out accepts any group size
    val optOut = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7,
      maxExactEvents = Long.MaxValue).collect()
    assert(optOut.length == 2)
  }

  test("decayedCounts: hand-computed per-day count·2^-k terms; " +
      "ledger-served equals scan-fed; mass bound raises") {
    val s = spark
    import s.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // category a: 3 events newest day (w=1), 2 events 7 days older
    // (w=1/2) -> score 4.0; category b: 5 events 14 days older (w=1/4)
    // -> 1.25
    val ev = (Seq.fill(3)(("a", ts(15))) ++ Seq.fill(2)(("a", ts(8))) ++
      Seq.fill(5)(("b", ts(1)))).toDF("cat", "ts")
    val got = Decay.decayedCounts(ev, "cat", "ts", halfLifeDays = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got == Map("a" -> ((5L, 0, 4.0)), "b" -> ((5L, 14, 1.25))))
    // ledger face: the same numbers from pre-aggregated counts
    val ledger = Seq(("a", "2024-01-15", 3L), ("a", "2024-01-08", 2L),
      ("b", "2024-01-01", 5L)).toDF("cat", "day", "cnt")
      .select(col("cat"), col("day").cast("date").as("day"), col("cnt"))
    val served = Decay.decayedCountsFromLedger(ledger, "day", "cat",
        "cnt", 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(served == got, "ledger-served diverged from scan-fed")
    // the mantissa bound counts LEDGER MASS, not rows
    intercept[Exception] {
      Decay.decayedCountsFromLedger(ledger, "day", "cat", "cnt", 7,
        maxExactEvents = 5L).collect()
    }
  }
}
