package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CoOccurSpec extends SparkTestBase {

  test("itemPmi matches hand-computed counts and PMI; repeats don't inflate") {
    val s = spark
    import s.implicits._
    // users 1,2 touch {a,b}; user 3 touches {a}; user 1 repeats b
    // (must not inflate). N=3, c_a=3, c_b=2, c_ab=2.
    val ev = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("u", "i")
    val out = CoOccur.itemPmi(ev, "u", "i", minUsers = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.length == 1)
    val (a, b, n, pmi) = out.head
    assert((a, b, n) == ("a", "b", 2L))
    assert(math.abs(pmi - math.log(2.0 * 3 / (3 * 2))) < 1e-12)
  }

  test("minUsers thresholds singleton evidence; unordered pairs emitted once") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"))
      .toDF("u", "i")
    // every pair co-occurs once -> empty at minUsers=2
    assert(CoOccur.itemPmi(ev, "u", "i", minUsers = 2).count() == 0)
    val once = CoOccur.itemPmi(ev, "u", "i", minUsers = 1)
      .select("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(once == Set(("a", "b"), ("b", "c")), s"got $once")
  }

  test("the power-user cap drops heavy users from N and every count") {
    val s = spark
    import s.implicits._
    // user 9 is a bot touching 5 items; cap=4 removes it entirely
    val ev = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++
      Seq("a", "b", "c", "d", "e").map(i => (9L, i))).toDF("u", "i")
    val out = CoOccur.itemPmi(ev, "u", "i", minUsers = 2,
      maxItemsPerUser = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // without the bot: N=2, c_a=c_b=2, c_ab=2 -> pmi = ln(2*2/4) = 0
    assert(out.toSeq == Seq(("a", "b", 2L, 0.0)), s"got ${out.toSeq}")
  }
}
