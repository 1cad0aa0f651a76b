package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._

/** Plan-shape proof of the co-located join: two tables bucketed on the
  * join key join with ZERO shuffles (the 100 TB win — the remaining
  * in-partition Sort is local CPU; Spark ≥3 no longer trusts bucket
  * sort order by default, SPARK-28616). */
class BucketingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed tables join without shuffle or sort") {
    val s = spark
    import s.implicits._
    val facts = (0 until 10000).map(i => (i.toLong % 500, s"f$i", i * 1.5))
      .toDF("k", "tag", "v")
    val dims = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("k", "name")

    // drop leftovers from any previous run — managed-table locations
    // outlive a failed suite
    Seq("bspec_facts", "bspec_dims", "bspec_dims16").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }

    Bucketing.writeBucketed(facts, "bspec_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "bspec_dims", Seq("k"), 8)
    assert(Bucketing.colocated(spark, "bspec_facts", "bspec_dims", Seq("k")))

    // forcing SMJ (no broadcast) shows the layout win; a broadcast would
    // hide the shuffle question entirely
    val joined = spark.table("bspec_facts")
      .hint("merge")
      .join(spark.table("bspec_dims"), "k")
    val rows = joined.count()
    assert(rows == 10000)

    val plan = joined.queryExecution.executedPlan
    val shuffles = collect(plan) { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"expected a shuffle-free co-located join, found: $shuffles")
    // any Sort the planner inserts must be partition-local (non-global):
    // bucket-aligned partitioning means no range exchange for ordering
    val sorts = collect(plan) { case e: SortExec => e }
    assert(sorts.forall(!_.global), s"unexpected global sort: $sorts")

    // and the same join WITHOUT bucketing does shuffle — the layout, not
    // luck, removed the exchanges
    val unbucketed = facts.hint("merge").join(dims, "k")
    unbucketed.count()
    val shuffled = collect(unbucketed.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffled.nonEmpty)

    // non-matching layouts are reported not co-located
    Bucketing.writeBucketed(dims, "bspec_dims16", Seq("k"), 16)
    assert(!Bucketing.colocated(spark, "bspec_facts", "bspec_dims16", Seq("k")))
  }
}
