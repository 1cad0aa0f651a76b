package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {

  private def apply(base: Seq[(Long, String, Double)],
      changes: Seq[(Long, String, Long, String, Double)])
      : Map[Long, (String, Double)] = {
    val s = spark
    import s.implicits._
    Cdc.applyChanges(
        base.toDF("k", "status", "total"),
        changes.toDF("k", "op", "ts", "status", "total"),
        "k", "op", "ts", Seq("status", "total"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2)))).toMap
  }

  test("last writer wins per key; deletes remove; inserts add; " +
      "untouched keys pass through") {
    val base = Seq((1L, "old", 10.0), (2L, "keep", 20.0), (3L, "gone", 30.0))
    val got = apply(base, Seq(
      (1L, "U", 5L, "mid", 11.0), (1L, "U", 9L, "new", 12.0),
      (3L, "D", 7L, "x", 0.0),
      (4L, "I", 2L, "fresh", 40.0)))
    assert(got == Map(
      1L -> (("new", 12.0)), 2L -> (("keep", 20.0)),
      4L -> (("fresh", 40.0))))
  }

  test("a delete then a later re-insert keeps the key; a late delete " +
      "after updates removes it") {
    val got = apply(Seq((1L, "a", 1.0), (2L, "b", 2.0)), Seq(
      (1L, "D", 5L, "x", 0.0), (1L, "I", 8L, "back", 9.0),
      (2L, "U", 3L, "c", 3.0), (2L, "D", 6L, "x", 0.0)))
    assert(got == Map(1L -> (("back", 9.0))))
  }

  test("I on an existing key behaves as upsert (at-least-once feeds); " +
      "equal-ts ties break deterministically") {
    val got = apply(Seq((1L, "a", 1.0)), Seq(
      (1L, "I", 5L, "dup", 7.0)))
    assert(got == Map(1L -> (("dup", 7.0))))
    // equal ts: 'U' > 'I' > 'D' descending op, then attrs descending
    val tie = apply(Seq.empty, Seq(
      (9L, "I", 5L, "zzz", 1.0), (9L, "U", 5L, "aaa", 2.0)))
    assert(tie == Map(9L -> (("aaa", 2.0))))
  }

  test("bad op codes fail loudly; NULL change keys/timestamps drop; " +
      "guards") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 1.0)).toDF("k", "status", "total")
    val bad = Seq((1L, "Z", 5L, "x", 0.0)).toDF("k", "op", "ts", "status", "total")
    intercept[Exception] {
      Cdc.applyChanges(base, bad, "k", "op", "ts",
        Seq("status", "total")).collect()
    }
    val nullish = Seq(
      (Option.empty[Long], "U", Some(5L), "x", 1.0),
      (Some(2L), "U", Option.empty[Long], "y", 2.0))
      .toDF("k", "op", "ts", "status", "total")
    val out = Cdc.applyChanges(base, nullish, "k", "op", "ts",
      Seq("status", "total")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L),
      "NULL-keyed / NULL-ts changes must not mutate the snapshot")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, bad, "k", "op", "ts", Nil)
    }
  }

  test("seeded fuzz: applyChanges equals a driver-side fold of the " +
      "ordered change log") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val base = (1L to 30L).map(k => (k, s"s$k", k.toDouble))
      val changes = (1 to 120).map { i =>
        val k = 1L + rnd.nextInt(40)
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        // distinct ts per (trial, i) so the driver fold is well-defined
        (k, op, i.toLong, s"c$i", i.toDouble)
      }
      val want = scala.collection.mutable.Map[Long, (String, Double)](
        base.map(r => r._1 -> ((r._2, r._3))): _*)
      changes.sortBy(_._3).foreach { case (k, op, _, st, tot) =>
        if (op == "D") want.remove(k) else want(k) = ((st, tot))
      }
      assert(apply(base, changes) == want.toMap, s"trial $trial")
    }
  }
}
