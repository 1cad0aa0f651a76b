package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components against an in-memory
  * union-find oracle: random graphs, worst-case chains, singleton
  * handling, duplicate/reversed/self pairs, partitioning independence,
  * and the survivor-discipline contrast with [[Dedup.dropNearDups]]'s
  * one-shot rule (which keeps both leaves of a star). */
class ComponentsSpec extends SparkTestBase {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // root compression to the minimum member: find() already unions
    // toward the min root because we always parent max under min
    nodes.map(x => x -> find(x)).toMap
  }

  private def got(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Components.connectedComponents(
        pairs.toDF("doc_a", "doc_b").repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graph matches union-find oracle") {
    val rnd = new scala.util.Random(29)
    val pairs = Seq.fill(300)(
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2)
    assert(got(pairs) == unionFind(200, pairs))
  }

  test("a long chain collapses to one component rooted at its minimum") {
    // 64-node chain: diameter 63, the worst case for label propagation;
    // star rounds must converge inside the MaxRounds guard
    val pairs = (1L until 64L).map(i => (i - 1, i))
    val r = got(pairs)
    assert(r.size == 64 && r.values.toSet == Set(0L))
  }

  test("duplicate, reversed and self pairs do not change the result") {
    val base = Seq((1L, 2L), (3L, 4L))
    val noisy = base ++ Seq((2L, 1L), (1L, 2L), (5L, 5L))
    assert(got(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty pairs give an empty frame") {
    assert(got(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("nearDupComponents: unpaired rows are their own component; " +
      "component-min filter keeps exactly one survivor per cluster") {
    val s = spark
    import s.implicits._
    val docs = (0L until 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // chain 0-1-2, star 3-5 + 4-5, pair 7-8; 6 and 9 unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 5L), (4L, 5L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val r = Components.nearDupComponents(docs, "doc_id", pairs)
      .select("doc_id", "component")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
    val survivors = Components.nearDupComponents(docs, "doc_id", pairs)
      .where(col("doc_id") === col("component"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 3L, 6L, 7L, 9L))
    // contrast with the one-shot rule: on the STAR (3-5, 4-5) it keeps
    // both leaves 3 and 4 (only 5 is ever named as doc_b), while the
    // transitive discipline keeps one survivor for the whole cluster
    val oneShot = Dedup.dropNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oneShot == Set(0L, 3L, 4L, 6L, 7L, 9L))
  }
}
