package graft.tools

import graft.SparkTestBase
import graft.operators.{AnnSearch, Blocking, SimilarityJoin, SimilarityJoinConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DEFAULT-SUITE scale canary (VERDICT r8 task 7): a ~10 s cut of
  * the Slow [[ScaleCanarySpec]] battery that runs in plain `sbt test`,
  * so the "validated floor" property maintains itself every build
  * instead of only when a round remembers `-Dgraft.slow=1 slowTest`.
  * Same [[SyntheticScale]] generators, same contracts, 20k rows instead
  * of 100k:
  *
  *  - IVF-PQ recall vs exact brute force on structureless vectors (the
  *    floor the r8 review found had never actually been validated),
  *  - auto token-salting engaging from the histogram on a planted hot
  *    token, result-identical to the unsalted run,
  *  - MinHash LSH banding recovering every eligible planted near-dup.
  *
  * The full 100k battery stays in ScaleCanarySpec (`slowTest`), with
  * its committed log each round. */
class MiniCanarySpec extends SparkTestBase {

  private val n = 20000

  test("mini-canary: IVF-PQ recall holds on 20k structureless vectors") {
    val emb = SyntheticScale.embeddings(spark, n.toLong)
    val q = emb.where(col("vec_id") % 200 === 0)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(AnnSearch.bruteForceTopK(q, emb, "vec_id",
      "embedding", k = 5))
    val flat = pairs(AnnSearch.ivfTopK(q, emb, "vec_id", "embedding",
      k = 5, nlist = 32, nprobe = 6))
    val rFlat = (exact intersect flat).size.toDouble / exact.size
    val pq = pairs(AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
      k = 5, nlist = 32, nprobe = 6, m = 8, ksub = 32, rescoreMult = 40))
    val rPq = (exact intersect pq).size.toDouble / exact.size
    info(f"20k IVF-flat ceiling=$rFlat%.3f  IVF-PQ recall@5=$rPq%.3f")
    // deterministic corpus + quantizers: measured 0.536 ceiling / 0.470
    // IVF-PQ at this parameterization (tools/pqtune_r9.txt discipline);
    // the floors sit under the measured values by the same margin the
    // smoke canary uses
    assert(rFlat >= 0.4, s"coarse pruning collapsed: $rFlat")
    assert(rPq >= 0.35, s"IVF-PQ recall collapsed: $rPq")
    // the composite can never beat its own pruning
    assert(rPq <= rFlat + 1e-9, s"IVF-PQ $rPq above its pruning ceiling $rFlat")
  }

  test("mini-canary: auto token salt engages on a planted hot token, result-identical") {
    // hot bucket 100 × 4000 = 400k candidate product > the 250k default
    // budget — the histogram must engage salting with NO flag set
    val (left, right) = SyntheticScale.skewTables(spark,
      nLeft = 1000, nRight = n, hotLeft = 100, hotRight = 4000,
      planted = 200)
    def cfg(salt: Int) = SimilarityJoinConfig(leftKey = "job_title",
      rightKey = "pay_title", preThreshold = 85, scoreThreshold = 85,
      blocking = Blocking.Token, tokenSalt = salt)
    def rowSet(df: DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val unsalted = rowSet(SimilarityJoin.scoredKeyPairs(left, right, cfg(1)))
    assert(unsalted.nonEmpty, "identity check must run on a non-empty set")
    val auto = SimilarityJoin.scoredKeyPairs(left, right, cfg(0))
    assert(auto.queryExecution.analyzed.toString.contains("__salt"),
      "auto token salt did not engage on the planted hot token")
    assert(rowSet(auto) == unsalted,
      "auto-salted results must be identical to unsalted")
  }

  test("mini-canary: minhash LSH recovers every eligible planted near-dup at 20k") {
    CanaryChecks.assertPlantedMinhashRecall(spark,
      SyntheticScale.docs(spark, n), n, minTruth = n / 250)
  }
}
