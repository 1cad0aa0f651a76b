package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake file-layer utilities mirroring the reference's storage helpers.
  *
  *  - [[mostRecentParquet]]: S3 "most-recent file" resolution
  *    (/root/reference/src/utils.py:32-42) — newest parquet by modification
  *    time under a path/glob.
  *  - [[writeParquet]]: the reference's buffered single-file sink +
  *    batch-merge dance (utils.py:50-116) collapses to one committed write;
  *    `singleFile` coalesces when a one-file artifact is required
  *    (cosmetic at small scale, avoid at 100 TB).
  *  - [[listLake]]: S4 bucket glob listing (utils.py:161-169).
  *
  * Hadoop-FileSystem-generic: every helper resolves the filesystem from
  * the PATH, so `file:`, `hdfs:` and `s3a:` lakes all work. The s3a path
  * is proven by S3LakeRoundTripSpec, which runs these helpers AND the
  * whole ingest→bronze→gold chain against `s3a://bucket/...` URIs backed
  * by an in-JVM object store with S3A semantics (graft.testkit
  * .InMemS3FileSystem) — against real S3/MinIO only `fs.s3a.impl` and
  * credentials change (the reference's substrate, docker-compose.yml:2-18).
  */
object LakeIO {

  // resolve the filesystem FROM the path — FileSystem.get(conf) returns
  // the default FS and throws "Wrong FS" for any other scheme (an
  // s3a:// lake on an hdfs-default cluster)
  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def listLake(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    Option(fsFor(spark, p).globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .map(_.getPath.toString)
  }

  /** Newest parquet under `path` (a file, a dir, or a glob). */
  def mostRecentParquet(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val f = fsFor(spark, p)
    // a candidate may be a single parquet file or a Spark-written
    // directory-of-parts — both are readable artifacts
    val candidates =
      if (f.exists(p) && f.getFileStatus(p).isFile) Seq(f.getFileStatus(p))
      else {
        val direct = Option(f.globStatus(p)).map(_.toSeq).getOrElse(Nil)
        if (direct.nonEmpty && !(direct.lengthCompare(1) == 0 && direct.head.isDirectory
            && direct.head.getPath.toString == f.makeQualified(p).toString)) direct
        else Option(f.globStatus(new Path(p, "*.parquet"))).map(_.toSeq)
          .getOrElse(Nil)
      }
    require(candidates.nonEmpty, s"No files found matching $path")
    candidates.maxBy(_.getModificationTime).getPath.toString
  }

  def writeParquet(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").parquet(path)
  }

  /** Lightcast-style analytics-table loader (SURVEY §2.1 S6). The reference
    * lands XLSX manually; the engine's supported path is header CSV (the
    * documented pre-conversion), typed via explicit casts. */
  def readLightcastCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .withColumn("Total Postings (Jan 2024 - Jun 2025)",
        col("Total Postings (Jan 2024 - Jun 2025)").cast("int"))
      .withColumn("Median Posting Duration",
        col("Median Posting Duration").cast("double"))
}
