package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze-layer registration: parquet files → catalog tables with audit
  * columns, mirroring the reference's CTAS
  * (/root/reference/src/utils.py:171-188):
  * `_source_file`, `_ingestion_timestamp`, `_record_id`.
  *
  * Two id flavors:
  *  - scalable (default): `monotonically_increasing_id()` — no shuffle, ids
  *    unique but sparse; the reference attaches no ordering meaning to
  *    `ROW_NUMBER() OVER ()` (unordered frame), so this is semantics-
  *    preserving at any scale.
  *  - exact: `row_number` over a caller-supplied ordering — single-partition
  *    window, only for small tables needing dense ids.
  */
object Bronze {

  def withAuditColumns(df: DataFrame, sourceFile: String,
      denseIdOrder: Option[Seq[String]] = None): DataFrame = {
    val base = df
      .withColumn("_source_file", lit(sourceFile))
      .withColumn("_ingestion_timestamp", current_timestamp())
    denseIdOrder match {
      case Some(orderCols) =>
        base.withColumn("_record_id",
          row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("bigint"))
      case None =>
        base.withColumn("_record_id", monotonically_increasing_id())
    }
  }

  /** Register one parquet file/dir as `bronze.<table>` (idempotent, like the
    * reference's CREATE TABLE IF NOT EXISTS). */
  def register(spark: SparkSession, path: String, table: String,
      denseIdOrder: Option[Seq[String]] = None): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS bronze")
    val qualified = s"bronze.$table"
    if (!spark.catalog.tableExists(qualified)) {
      val name = path.split('/').last.stripSuffix(".parquet")
      withAuditColumns(spark.read.parquet(path), name, denseIdOrder)
        .write.saveAsTable(qualified)
    }
  }

  /** Register every parquet under a lake directory, deriving table names the
    * way the reference does (lowercase, dashes/spaces → underscores;
    * utils.py:172-173). */
  def registerLake(spark: SparkSession, lakeDir: String): Seq[String] = {
    val files = LakeIO.listLake(spark, s"$lakeDir/*.parquet")
    files.map { f =>
      val table = f.split('/').last.stripSuffix(".parquet")
        .toLowerCase.replace("-", "_").replace(" ", "_")
      register(spark, f, table)
      table
    }
  }
}
