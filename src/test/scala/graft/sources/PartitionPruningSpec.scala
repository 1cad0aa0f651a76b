package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Plan-shape proof of partition pruning — the other lake-layout lever
  * next to bucketing (BucketingSpec): a Hive-partitioned write plus a
  * partition-key predicate scans ONLY the matching directories. At
  * 100 TB this is what turns "read the lake" into "read today's
  * partition"; the reference's most-recent-file convention (SURVEY §2.1
  * S3) becomes `max(partition)` under this layout. */
class PartitionPruningSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("partition-key predicates prune directories at the scan") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pruning").toString
    val rows = (0 until 9000).map(i =>
      (i.toLong, s"2025-0${1 + i % 3}", i * 1.5))
    rows.toDF("id", "ingest_month", "v")
      .write.mode("overwrite").partitionBy("ingest_month")
      .parquet(s"$tmp/events")

    val pruned = spark.read.parquet(s"$tmp/events")
      .where(col("ingest_month") === "2025-02")
    assert(pruned.count() == 3000)

    val scans = collect(pruned.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // the predicate landed in partitionFilters (directory-level), not in
    // dataFilters (row-level post-scan)
    assert(scan.partitionFilters.exists(_.toString.contains("ingest_month")),
      s"no partition filter in ${scan.partitionFilters}")
    // only 1 of the 3 month directories is actually selected
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")

    // most-recent-partition resolution — the scalable replacement for
    // the reference's newest-file-by-ctime (utils.py:32-42)
    val latest = spark.read.parquet(s"$tmp/events")
      .select(max(col("ingest_month"))).head().getString(0)
    assert(latest == "2025-03")
  }
}
