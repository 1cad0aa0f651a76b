package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.queries.Tables.t

/** Multimodal plumbing battery: binary payload metadata (columnar, no
  * decode) with a DuckDB oracle; the stubbed decode path is covered by
  * MultimodalSpec. Text bytes stand in for media payloads. */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("bin", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          Multimodal.binaryMeta(col("bin")).as("m"))
        .select(col("doc_id"), col("m.n_bytes").as("n_bytes"),
          col("m.header_hex").as("header_hex")))
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       hex(substring(text, 1, 8)) AS header_hex
        |FROM documents""".stripMargin
  )
}
