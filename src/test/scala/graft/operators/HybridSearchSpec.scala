package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkTestBase {

  test("rrf matches the hand-computed fusion with per-leg membership") {
    val s = spark
    import s.implicits._
    // leg A ranks docs 1..4, leg B ranks 3,4,5,6 — overlap {3,4}
    val legA = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val legB = Seq((3L, 1), (4L, 2), (5L, 3), (6L, 4)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(legA, legB), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getInt(3)))
    def c(r: Int) = 1.0 / (60.0 + r)
    val want = Map(
      1L -> (c(1), 1L), 2L -> (c(2), 1L),
      3L -> (c(3) + c(1), 2L), 4L -> (c(4) + c(2), 2L),
      5L -> (c(3), 1L), 6L -> (c(4), 1L))
    assert(out.length == 6)
    out.foreach { case (id, rrf, hits, _) =>
      assert(rrf == want(id)._1, s"id=$id rrf")
      assert(hits == want(id)._2, s"id=$id legs_hit")
    }
    // overlap docs outrank single-leg docs; ranks are 1..6 in rrf order
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._4).toSeq == (1 to 6))
    assert(byRank.map(_._1).take(2).toSet == Set(3L, 4L))
    assert(byRank.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
  }

  test("rrf ties break on id ascending, k cuts after the tie-break") {
    val s = spark
    import s.implicits._
    // symmetric ranks → equal rrf for all four docs
    val legA = Seq((10L, 1), (20L, 2), (30L, 3), (40L, 4)).toDF("id", "rank")
    val legB = Seq((40L, 1), (30L, 2), (20L, 3), (10L, 4)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(legA, legB), "id", "rank", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    // pairs (1,4) and (2,3) tie pairwise: {10,40} then {20,30}, id asc
    assert(out.sortBy(_._2).map(_._1).toSeq == Seq(10L, 40L))
  }

  test("h1_hybrid_rrf fuses the bm25 and ann legs end-to-end") {
    val out = graft.SparkEntry.queries("h1_hybrid_rrf")(spark, sf())
      .collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(3)).sorted.toSeq == (1 to 10))
    // every fused doc was hit by at least one leg, at most both
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 2))
    // at least one doc should appear in both legs on this corpus
    assert(out.exists(_.getLong(2) == 2L),
      "no overlap between lexical and semantic legs — suspicious")
  }
}
