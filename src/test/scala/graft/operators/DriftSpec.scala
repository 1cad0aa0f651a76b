package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {

  test("tvDrift: identical adjacent distributions score 0, a full swap " +
      "scores 1, pairs are adjacent-only and ordered") {
    val s = spark
    import s.implicits._
    // p1: 2a+2b; p2: 2a+2b (tv 0); p3: 4c (tv 1 vs p2); p4: 2a+2c
    // (tv vs p3: |0-?|... computed below)
    val df = (
      Seq.fill(2)((1, "a")) ++ Seq.fill(2)((1, "b")) ++
      Seq.fill(2)((2, "a")) ++ Seq.fill(2)((2, "b")) ++
      Seq.fill(4)((3, "c")) ++
      Seq.fill(2)((4, "a")) ++ Seq.fill(2)((4, "c")))
      .toDF("period", "cat")
    val got = Drift.tvDrift(df, "period", "cat", threshold = 0.4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set((1, 2), (2, 3), (3, 4)),
      "exactly the adjacent ordered pairs")
    assert(got((1, 2)) == ((4L, 4L, 0.0, 0L)))
    assert(got((2, 3)) == ((4L, 4L, 1.0, 1L)))
    // p3 = {c:1}; p4 = {a:.5, c:.5}: tv = (|0-.5| + |1-.5|)/2 = 0.5
    assert(got((3, 4)) == ((4L, 4L, 0.5, 1L)))
  }

  test("levelShift: exact window sums and ratios; edges without full " +
      "windows emit nothing; a calendar gap is a missing snapshot") {
    val s = spark
    import s.implicits._
    // periods 1..8 with volumes 10,10,10,10,40,40,40,40 — the jump
    // lands where the after-window first catches the 40s
    val df = (1 to 8).flatMap(p =>
      Seq.fill(if (p <= 4) 10 else 40)(p)).toDF("period")
    val got = Drift.levelShift(df, "period", windowN = 3, threshold = 0.25)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getLong(5)))).toMap
    // full windows exist only for periods 4..6 (3 before, 3 incl self)
    assert(got.keySet == Set(4, 5, 6))
    assert(got(4) == ((10L, 30L, 90L, 2.0, 1L)))        // 10+10+10 vs 10+40+40
    assert(got(5) == ((40L, 30L, 120L, 3.0, 1L)))       // vs 40+40+40
    assert(got(6) == ((40L, 60L, 120L, 1.0, 1L)))       // 10+40+40 vs 40s
    // a GAP (period 9 missing, 10..12 present) shifts the window over
    // observed snapshots, not calendar slots
    val gapped = (Seq(1, 2, 3, 4) ++ Seq(10, 11, 12)).flatMap(p =>
      Seq.fill(10)(p)).toDF("period")
    val g2 = Drift.levelShift(gapped, "period", 3, 0.25)
      .collect().map(_.getInt(0)).toSet
    assert(g2 == Set(4, 10), "windows run over observed periods")
  }

  test("levelShift: ledger-served equals scan-fed; flat series never " +
      "flags; guards") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).flatMap(p => Seq.fill(7)((p, "c" + (p % 2))))
      .toDF("period", "cat")
    val scan = Drift.levelShift(df.select(col("period")), "period", 2, 0.25)
      .collect().map(_.toSeq).toSet
    val ledger = df.groupBy("period", "cat")
      .agg(count(lit(1)).as("cnt"))
    val served = Drift.levelShiftFromLedger(ledger, "period", "cnt", 2, 0.25)
      .collect().map(_.toSeq).toSet
    assert(scan == served && scan.nonEmpty)
    assert(scan.forall(r => r(4) == 0.0 && r(5) == 0L),
      "a flat series must not flag")
    intercept[IllegalArgumentException] {
      Drift.levelShift(df, "period", 0, 0.25)
    }
    intercept[IllegalArgumentException] {
      Drift.levelShift(df, "period", 3, 0.0)
    }
    // an all-zero before-window in a ledger raises instead of emitting
    // an Infinity ratio that reads as "no shift" (ADVICE r16)
    val zeroLedger = Seq((1, "c", 0L), (2, "c", 0L), (3, "c", 5L),
      (4, "c", 5L)).toDF("period", "cat", "cnt")
    val err = intercept[Exception] {
      Drift.levelShiftFromLedger(zeroLedger, "period", "cnt", 1, 0.25)
        .collect()
    }
    assert(err.getMessage.contains("before_sum must be positive"))
  }

  test("tvDrift: NULL periods/categories drop; single period emits " +
      "no pairs; guards") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1), Some("a")), (Some(1), None),
      (None, Some("a"))).toDF("period", "cat")
    assert(Drift.tvDrift(df, "period", "cat", 0.5).count() == 0)
    intercept[IllegalArgumentException] {
      Drift.tvDrift(df, "period", "cat", 0.0)
    }
  }
}
