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
