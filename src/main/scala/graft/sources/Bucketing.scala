package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the co-located join primitive at 100 TB.
  *
  * A fact table bucketed by its join key joins another table bucketed
  * the same way with NO shuffle: each task merge-joins bucket i of both
  * sides. For the reference workload this is how
  * `bronze.payroll ⋈ bronze.jobs`-shaped repeat joins should be laid
  * out — pay one bucketed write, then every downstream join of the two
  * tables skips both exchanges (BucketingSpec pins the plan shape:
  * zero ShuffleExchange). The within-bucket `sortBy` keeps files
  * merge-friendly; Spark ≥3 still inserts an in-partition Sort node
  * (it stopped trusting bucket sort order by default, SPARK-28616 —
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` restores it),
  * but that sort is local CPU over one bucket, not the network exchange
  * that dominates at 100 TB.
  *
  * Spark only honors bucketing through the catalog (`saveAsTable`) —
  * a plain parquet `save(path)` silently drops the layout, so this
  * helper exists to make the contract explicit.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed by `keyCols` into
    * `numBuckets`, sorted within buckets by the same keys (enables
    * merge-join without a Sort node). Overwrites any existing table. */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
      numBuckets: Int): Unit = {
    require(keyCols.nonEmpty, "bucketing needs at least one key column")
    // align the write partitioning with the bucket function (same
    // Murmur3 hash): one file per bucket instead of tasks × buckets
    // small files, and single-file buckets let the scan report its sort
    // order so downstream merge-joins skip the Sort node too
    df.repartition(numBuckets, keyCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }

  /** True iff `t1` and `t2` are bucketed compatibly on `keyCols` (same
    * bucket count, same key set) — the precondition for a shuffle-free
    * join between them. */
  def colocated(spark: SparkSession, t1: String, t2: String,
      keyCols: Seq[String]): Boolean = {
    def spec(t: String): Option[(Int, Seq[String])] = {
      val cat = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      cat.bucketSpec.map(b => (b.numBuckets, b.bucketColumnNames))
    }
    (spec(t1), spec(t2)) match {
      case (Some((n1, k1)), Some((n2, k2))) =>
        n1 == n2 && k1 == keyCols && k2 == keyCols
      case _ => false
    }
  }
}
