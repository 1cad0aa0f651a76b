package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {

  /** Driver-side reference: same formulation, same per-round 12-decimal
    * rounding. */
  private def reference(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val teleport = (1.0 - d) / n
    def round12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => pr(src) / outdeg(src) }.sum
      }
      pr = nodes.map(v =>
        v -> round12(teleport + d * contrib.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String)], iters: Int)
      : Map[String, Double] = {
    val s = spark
    import s.implicits._
    PageRank.fixedIter(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("cycle stays uniform at every iteration") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val got = run(cycle, 5)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, got))
  }

  test("matches the driver-side reference on a graph with hubs and a dangling node") {
    // b and c feed hub a; a fans out; d dangles (absorbs, never emits)
    val edges = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "a",
      "c" -> "a", "b" -> "d", "c" -> "b")
    val got = run(edges, 4)
    val want = reference(edges, 4)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"$k: $v != ${want(k)}")
    }
    // hub ordering: a collects two full ranks, d only absorbs
    assert(got("a") > got("b") && got("a") > got("c"))
    // dangling leak: total mass strictly below 1 but above (1-d)
    val mass = got.values.sum
    assert(mass < 1.0 && mass > 0.15, s"mass $mass")
  }

  test("deterministic under repartitioning; duplicate edges collapse") {
    val s = spark
    import s.implicits._
    val edges = (0 until 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}"))
    val base = run(edges, 3)
    val repart = PageRank.fixedIter(
      edges.toDF("s", "d").repartition(11, col("s")), "s", "d", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(base == repart)
    // duplicating rows must not change the distinct edge set's result
    val dup = run(edges ++ edges, 3)
    assert(base == dup)
  }
}
