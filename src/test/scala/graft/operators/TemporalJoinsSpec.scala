package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkTestBase {

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("asof join matches the brute-force latest-at-or-before oracle") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(500))))
    val rights = (0 until 300).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, ts(rnd.nextInt(500)), rnd.nextDouble()))
    val l = lefts.toDF("lid", "k", "lts")
    val r = rights.toDF("rid", "k", "rts", "v")

    val out = TemporalJoins.asofJoin(l, r, keys = Seq("k"),
      leftTs = "lts", rightTs = "rts", rightCols = Seq("rid", "v"),
      tieBreak = Seq(col("rid")))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(4)) None else Some(row.getLong(4)))).toMap

    lefts.foreach { case (lid, k, lts) =>
      val cands = rights.filter(rr => rr._2 == k && !rr._3.after(lts))
      val expected =
        if (cands.isEmpty) None
        else {
          val maxTs = cands.map(_._3.getTime).max
          // tie winner = greatest rid in NATIVE (numeric) order
          Some(cands.filter(_._3.getTime == maxTs).maxBy(_._1)._1)
        }
      assert(out(lid) == expected, s"left $lid key $k ts $lts")
    }
  }

  test("asof tolerance nulls out stale matches") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, ts(100)), (2L, 1L, ts(500))).toDF("lid", "k", "lts")
    val r = Seq((10L, 1L, ts(95), 1.0)).toDF("rid", "k", "rts", "v")
    val out = TemporalJoins.asofJoin(l, r, Seq("k"), "lts", "rts",
      Seq("rid", "v"), tolerance = Some("'10' MINUTE"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    assert(out(1L).contains(10L)) // 5 min old — inside tolerance
    assert(out(2L).isEmpty)       // 405 min old — stale
  }

  test("asof ignores right rows with a NULL timestamp") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, ts(100))).toDF("lid", "k", "lts")
    val r = Seq((10L, 1L, null.asInstanceOf[Timestamp], 1.0),
      (11L, 1L, ts(50), 2.0)).toDF("rid", "k", "rts", "v")
    val out = TemporalJoins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid", "v"))
      .select("lid", "asof_rid").collect()
    assert(out.head.getLong(1) == 11L) // the null-ts row never matches
    val onlyNull = TemporalJoins.asofJoin(l,
      r.where(col("rid") === 10L), Seq("k"), "lts", "rts", Seq("rid", "v"))
    assert(onlyNull.where(col("asof_rid").isNull).count() == 1)
  }

  test("asof join output keeps unmatched left rows (left-join semantics)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 7L, ts(10))).toDF("lid", "k", "lts")
    val r = Seq((10L, 7L, ts(20), 0.5)).toDF("rid", "k", "rts", "v") // only AFTER
    val out = TemporalJoins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid", "v"))
    assert(out.count() == 1)
    assert(out.where(col("asof_rid").isNull).count() == 1)
  }

  test("interval join equals the predicate filter on the cross space") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val clicks = (0 until 150).map(i => (i.toLong, rnd.nextInt(6).toLong, ts(rnd.nextInt(300))))
    val views = (0 until 200).map(i => (500L + i, rnd.nextInt(6).toLong, ts(rnd.nextInt(300))))
    val c = clicks.toDF("cid", "k", "cts")
    val v = views.toDF("vid", "k", "vts")
    val got = TemporalJoins.intervalJoin(c, v, Seq("k"), "cts", "vts", "30 minutes")
      .select("cid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (cid, ck, cts) <- clicks
      (vid, vk, vts) <- views
      if ck == vk && vts.getTime >= cts.getTime &&
        vts.getTime <= cts.getTime + 30 * 60000L
    } yield (cid, vid)).toSet
    assert(got == expected)
  }

  test("interval join rejects a rightTs that is not a right-frame column") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, 1L, ts(0))).toDF("cid", "k", "ts")
    val v = Seq((2L, 1L, ts(1))).toDF("vid", "k", "ts")
    // "r_ts" is the POST-rename name — the contract wants the original
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(c, v, Seq("k"), "ts", "r_ts", "30 minutes")
    }
    assert(e.getMessage.contains("pre-rename"))
  }

  test("interval join rejects pre-existing prefixed collision names") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, 1L, ts(0))).toDF("cid", "k", "ts")
    // right already has r_ts; renaming its own "ts" → "r_ts" would
    // silently produce two r_ts output columns
    val v = Seq((2L, 1L, ts(1), ts(2))).toDF("vid", "k", "ts", "r_ts")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(c, v, Seq("k"), "ts", "ts", "30 minutes")
    }
    assert(e.getMessage.contains("r_ts"))
  }
}
