package graft.operators

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {

  private def counts(edges: Seq[(Int, Int)]): Map[Int, Long] = {
    val s = spark
    import s.implicits._
    Triangles.perNodeCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("K4: every node sits in 3 of the 4 triangles; C5 has none") {
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(counts(k4) == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    val c5 = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 1))
    assert(counts(c5).isEmpty)
  }

  test("duplicates, reversed directions, self-loops and pendant nodes " +
      "do not change the count") {
    val noisy = Seq((1, 2), (2, 1), (1, 2), (1, 3), (2, 3), (3, 3),
      (3, 9)) // one triangle {1,2,3}, a self-loop, a pendant 9
    assert(counts(noisy) == Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("two triangles sharing an edge: the shared endpoints count both") {
    // {1,2,3} and {1,2,4} share edge (1,2)
    val g = Seq((1, 2), (1, 3), (2, 3), (1, 4), (2, 4))
    assert(counts(g) == Map(1 -> 2L, 2 -> 2L, 3 -> 1L, 4 -> 1L))
  }

  test("seeded random graphs match the brute-force enumeration") {
    val rnd = new scala.util.Random(14)
    (1 to 3).foreach { trial =>
      val n = 24
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        .withDefaultValue(Set.empty[Int])
      val brute = (for {
        a <- 1 to n; b <- adj(a); c <- adj(a)
        if b < c && adj(b).contains(c)
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(counts(edges) == brute, s"trial $trial, |E|=${edges.size}")
    }
  }
}
