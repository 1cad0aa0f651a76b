package graft.sources

import graft.SparkTestBase
import graft.operators.{Blocking, SimilarityJoin, SimilarityJoinConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** VERDICT r5 task 3: bronze match inputs laid out bucketed by their title
  * key make the similarity join's distinct-key stage exchange-free.
  *
  * `scoredKeyPairs` opens with `select(title).distinct()` per side — on a
  * plain layout that is HashAggregate(partial) → ENSURE_REQUIREMENTS
  * Exchange hashpartitioning(key) → HashAggregate(final), and at 100 TB
  * the exchange carries every per-partition-distinct raw title over the
  * network, every weekly run. A table bucketed by the title column
  * already satisfies the aggregate's ClusteredDistribution (the scan
  * reports HashPartitioning over the bucket column, alias-tracked through
  * the key_l/key_r projection), so the exchange vanishes from the plan —
  * the win repeats on every downstream run reading the same layout.
  *
  * The pinned contract: bucketed inputs plan ZERO single-key hash
  * exchanges (key_l alone or key_r alone — the distinct-stage shape; the
  * Token path's post-scoring pair dedup on BOTH keys and its token-bucket
  * exchanges are unrelated and stay), while the same query over plain
  * frames plans at least one, and both produce identical pairs.
  */
class BucketedMatchInputsSpec extends SparkTestBase
    with AdaptiveSparkPlanHelper {

  /** Hash-exchange partitioning key lists that consist of exactly one
    * title-derived column — the distinct-key stage's signature. */
  private def singleKeyExchanges(df: DataFrame): Seq[String] = {
    df.write.format("noop").mode("overwrite").save()
    collect(df.queryExecution.executedPlan) { case e: ShuffleExchangeLike => e }
      .map(_.outputPartitioning)
      .collect {
        case h: HashPartitioning if h.expressions.size == 1 &&
            Seq("key_l", "key_r", "business_title", "title_description")
              .exists(h.expressions.head.sql.contains) =>
          h.expressions.head.sql
      }
  }

  private def pairSet(df: DataFrame): Set[(String, String, Double)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("bucketed match inputs skip the distinct-key exchange on both paths") {
    val s = spark
    import s.implicits._
    // mostly-unique two-word titles: the distinct stage dominates, token
    // buckets stay tiny, and the 800 planted equal titles give a
    // non-empty result to compare
    val jobs = (0 until 1000).map(i => (i.toLong, s"alpha$i beta$i"))
      .toDF("job_id", "business_title")
    val payroll = (0 until 4000).map(i =>
      (i.toLong, s"alpha${i % 800} beta${i % 800}", 50000.0 + i))
      .toDF("pay_id", "title_description", "base_salary")

    Seq("bmi_jobs", "bmi_payroll").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Bucketing.writeBucketed(jobs, "bmi_jobs", Seq("business_title"), 8)
    Bucketing.writeBucketed(payroll, "bmi_payroll", Seq("title_description"), 8)

    def cfg(b: Blocking) = SimilarityJoinConfig(
      leftKey = "business_title", rightKey = "title_description",
      preThreshold = 85, scoreThreshold = 85, blocking = b)

    for (b <- Seq(Blocking.Exact: Blocking, Blocking.Token: Blocking)) {
      val plain = SimilarityJoin.scoredKeyPairs(jobs, payroll, cfg(b))
      val bucketed = SimilarityJoin.scoredKeyPairs(
        spark.table("bmi_jobs"), spark.table("bmi_payroll"), cfg(b))
      val plainEx = singleKeyExchanges(plain)
      val bucketedEx = singleKeyExchanges(bucketed)
      assert(plainEx.nonEmpty,
        s"$b: expected the plain layout to shuffle for distinct keys")
      assert(bucketedEx.isEmpty,
        s"$b: bucketed layout still plans distinct-key exchanges: $bucketedEx")
      val got = pairSet(bucketed)
      assert(got == pairSet(plain) && got.nonEmpty,
        s"$b: layout changed the result")
    }
  }
}
