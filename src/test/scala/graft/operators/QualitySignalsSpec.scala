package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class QualitySignalsSpec extends SparkTestBase {

  private def metrics(rows: Seq[(Long, String)], width: Int = 3)
      : Map[Long, Row] = {
    val s = spark
    import s.implicits._
    QualitySignals.lineRepetition(rows.toDF("doc_id", "text"),
        "doc_id", "text", lineWidth = width)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("hand-computed metrics on structured docs (width 3)") {
    val got = metrics(Seq(
      // 1: two identical 3-token lines → lines ["a b c","a b c"]:
      //    dup_line_frac 0.5, dup chars 5/10; 2-grams: a b, b c, c a,
      //    a b, b c → top "a b" (or "b c") 2 of 5
      1L -> "a b c a b c",
      // 2: all lines distinct → zeros except top gram 1/3
      2L -> "w x y z",
      // 3: empty text → all zeros
      3L -> "   ",
      // 4: single token → one line, no grams
      4L -> "solo"))

    val r1 = got(1L)
    assert(r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 0.5)
    assert(r1.getDouble(3) == 0.5)
    assert(r1.getDouble(4) == 2.0 / 5.0)

    val r2 = got(2L)
    assert(r2.getLong(1) == 2L) // "w x y" + "z"
    assert(r2.getDouble(2) == 0.0)
    assert(r2.getDouble(3) == 0.0)
    assert(r2.getDouble(4) == 1.0 / 3.0)

    val r3 = got(3L)
    assert(r3.getLong(1) == 0L && r3.getDouble(2) == 0.0 &&
      r3.getDouble(3) == 0.0 && r3.getDouble(4) == 0.0)

    val r4 = got(4L)
    assert(r4.getLong(1) == 1L)
    assert(r4.getDouble(2) == 0.0 && r4.getDouble(4) == 0.0)
  }

  test("boilerplate doc scores high; diverse doc scores low") {
    val boiler = Seq.fill(10)("home about contact").mkString(" ")
    val diverse = (1 to 30).map(i => s"tok$i").mkString(" ")
    val got = metrics(Seq(10L -> boiler, 11L -> diverse))
    assert(got(10L).getDouble(2) == 0.9) // 10 identical lines, 1 distinct
    assert(got(10L).getDouble(3) == 0.9)
    assert(got(11L).getDouble(2) == 0.0)
    assert(got(11L).getDouble(4) <= 1.0 / 29.0 + 1e-12)
  }

  test("every input row appears exactly once in the output") {
    val got = metrics((0L until 50L).map(i =>
      i -> (if (i % 5 == 0) "" else s"a b c d${i % 7} e f")))
    assert(got.size == 50)
  }
}
