package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkTestBase {

  test("learns the classic low/lower/lowest merges, hand-computed") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    val got = BpeTrain.learnMerges(docs, "doc_id", "text", numMerges = 4)
    // pairs round 1: (l,o)=3, (o,w)=3, others <=2 — tie broken
    // lexicographically to (l,o); then (lo,w)=3; then (low,e)=2; then
    // (lowe,r)=1 vs (lowe,s)=1 vs (s,t)=1 — lexicographic min (lowe,r)
    assert(got == IndexedSeq(
      ("l", "o", 3L), ("lo", "w", 3L), ("low", "e", 2L),
      ("lowe", "r", 1L)), s"got $got")
  }

  test("pair counts include overlapping occurrences and weight by word frequency") {
    val s = spark
    import s.implicits._
    // "aaa" twice -> (a,a) occurs 2 positions x 2 docs = 4
    val docs = Seq((1L, "aaa"), (2L, "aaa")).toDF("doc_id", "text")
    val got = BpeTrain.learnMerges(docs, "doc_id", "text", numMerges = 2)
    assert(got.head == ("a", "a", 4L), s"got $got")
    // greedy left-to-right: "aaa" -> [aa, a]; round 2 merges (aa, a)
    assert(got(1) == ("aa", "a", 2L), s"got $got")
  }

  test("learned-BPE invariant holds on real data; training is deterministic") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val m1 = BpeTrain.learnMerges(docs, "doc_id", "text",
      numMerges = 32, maxTrainDocs = 2048)
    val m2 = BpeTrain.learnMerges(docs, "doc_id", "text",
      numMerges = 32, maxTrainDocs = 2048)
    assert(m1 == m2, "training must be deterministic")
    assert(m1.size == 32)
    // every entry's parts are single characters or outputs of EARLIER
    // entries (the invariant the fixed BpeKernel table documents)
    val outputs = scala.collection.mutable.Set.empty[String]
    m1.foreach { case (l, r, _) =>
      assert(l.length == 1 || outputs.contains(l),
        s"left '$l' is neither a char nor an earlier output")
      assert(r.length == 1 || outputs.contains(r),
        s"right '$r' is neither a char nor an earlier output")
      outputs += (l + r)
    }
    // selection frequencies are non-negative and the first merge is the
    // sample's most frequent pair (weakly decreasing is NOT required —
    // a merge can create a pair more frequent than later raw pairs)
    assert(m1.forall(_._3 > 0))
  }

  test("a learned table drives rank-priority inference (encodeWord)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, "doc_id", "text", 4)
    val ranks = merges.zipWithIndex
      .map { case ((l, r, _), i) => (l, r) -> i }.toMap
    assert(BpeTrain.encodeWord("lower", ranks).toSeq == Seq("lower"))
    assert(BpeTrain.encodeWord("lowest", ranks).toSeq ==
      Seq("lowe", "s", "t"))
    assert(BpeTrain.encodeWord("slow", ranks).toSeq == Seq("s", "low"))
    // unseen characters degrade to singletons, never throw
    assert(BpeTrain.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
  }
}
