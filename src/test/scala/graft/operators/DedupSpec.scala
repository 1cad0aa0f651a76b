package graft.operators

import graft.SparkTestBase
import graft.queries.Tables.t
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private def docs = t(spark, sf(), "documents")

  test("exact dedup keeps one id per distinct text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val total = docs.count()
    assert(out.agg(sum("dup_count")).head.getLong(0) == total)
    assert(out.count() == docs.select("text").distinct().count())
  }

  test("exact shingle-jaccard join finds the planted near-dups symmetrically") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.5)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("minhash LSH recall is total against exact jaccard at theta 0.5") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // shingle simhash at hd<=7 should recover most jaccard>=0.9 pairs
    if (exact.nonEmpty) {
      val recall = (exact intersect sim).size.toDouble / exact.size
      info(s"simhash recall over ${exact.size} j>=0.9 pairs = $recall")
      assert(recall >= 0.5, s"simhash recall $recall over ${exact.size} pairs")
    }
    // and every emitted pair is within the distance bound by construction
    val dists = Dedup.simhashPairs(docs, "doc_id", "text", 7).select("hamming").collect()
    assert(dists.forall(_.getInt(0) <= 7))
  }

  test("identical text gives identical simhash (hamming 0)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence here")).toDF("doc_id", "text")
    val out = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }
}
