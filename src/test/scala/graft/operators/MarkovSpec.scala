package graft.operators

import graft.SparkTestBase

class MarkovSpec extends SparkTestBase {

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private def run(rows: Seq[(java.lang.Long, String, Int, Long)])
      : Map[(String, String), (Long, Double)] = {
    val s = spark
    import s.implicits._
    val df = rows.map { case (u, t, m, id) => (u, t, ts(m), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    Markov.transitions(df, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
  }

  test("hand-computed transition matrix with row-normalized p") {
    val got = run(Seq(
      (1L, "view", 1, 10L), (1L, "click", 2, 11L), (1L, "view", 3, 12L),
      (2L, "view", 1, 20L), (2L, "view", 2, 21L),
      // single-event user: no transition
      (3L, "buy", 5, 30L)))
    assert(got == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("simultaneous events order by the id tie-break") {
    val got = run(Seq(
      (1L, "a", 1, 2L), (1L, "b", 1, 1L)))  // same ts: b (id 1) first
    assert(got == Map(("b", "a") -> ((1L, 1.0))))
  }

  test("null users/states/timestamps drop; sequences never cross users") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), "a", ts(1), 1L),
      (null.asInstanceOf[java.lang.Long], "b", ts(2), 2L),
      (java.lang.Long.valueOf(2L), "c", ts(3), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Markov.transitions(df, "user_id", "event_type", "ts",
      "event_id").collect()
    assert(got.isEmpty) // no user has two events
  }
}
