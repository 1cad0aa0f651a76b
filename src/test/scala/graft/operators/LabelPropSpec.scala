package graft.operators

import graft.SparkTestBase

class LabelPropSpec extends SparkTestBase {

  private def undirected(pairs: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("two dense cliques joined by a bridge converge to per-clique labels") {
    // clique {a1,a2,a3}, clique {b1,b2,b3}, bridge a3–b1
    val edges = undirected(Seq(
      ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
      ("a3", "b1")))
    val got = LabelProp.fixedIter(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // within each clique everyone agrees; the two cliques disagree
    assert(got("a1") == got("a2") && got("a2") == got("a3"))
    assert(got("b1") == got("b2") && got("b2") == got("b3"))
    assert(got("a1") != got("b1"))
  }

  test("tie-break: equal vote counts pick the smallest label") {
    // c has exactly two in-neighbors with distinct labels after round
    // 1 init — the winner must be the lexicographically smaller
    val s = spark
    import s.implicits._
    val edges = Seq(("x", "c"), ("y", "c")).toDF("src", "dst")
    val got = LabelProp.fixedIter(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("c") == "x")
    // x and y have no in-edges: labels kept
    assert(got("x") == "x" && got("y") == "y")
  }

  test("fixed-round trajectory is deterministic across repartitioning") {
    val s = spark
    import s.implicits._
    val edges = undirected((1 to 40).map(i =>
      (s"n${i % 13}", s"n${(i * 7) % 13}")).filter(p => p._1 != p._2))
    val a = LabelProp.fixedIter(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = LabelProp.fixedIter(
        edges.repartition(7, org.apache.spark.sql.functions.col("dst")),
        "src", "dst", iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("iteration guard") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      LabelProp.fixedIter(edges, "src", "dst", iters = 0)
    }
  }
}
