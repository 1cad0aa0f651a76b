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
          col("m.header_hex").as("header_hex"))),

    "m2_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        t(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "bin", frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          hex(col("frame")).as("frame_hex"))),

    // posexplode to scalar rows: the gate's pandas compare can't sort or
    // hash an array column, and scalar (doc, idx, feature) rows let the
    // stub histogram decoder be oracle-checked bit-exactly (REAL/REAL
    // division in DuckDB is float32, same as the Scala kernel's)
    "m3_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        t(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "doc_id", "bin")
        .select(col("doc_id"),
          posexplode(col("features")).as(Seq("feature_idx", "feature"))))
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       hex(substring(text, 1, 8)) AS header_hex
        |FROM documents""".stripMargin,

    // DuckDB 1.0 has no BLOB substring; the corpus is pure ASCII
    // (octet_length(encode(text)) = length(text) for every doc), so
    // VARCHAR slicing is byte-exact here.
    "m2_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |        unnest(range(0, CAST(floor(octet_length(encode(text)) / 64) AS BIGINT), 2)) AS fi
        |      FROM documents)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |       hex(substring(text, CAST(fi * 64 + 1 AS INT), 64)) AS frame_hex
        |FROM f""".stripMargin,

    // stub decoder = normalized byte histogram over 8 buckets; corpus is
    // pure ASCII so per-char code points equal per-byte values
    "m3_decode_features" ->
      """WITH f AS (SELECT doc_id, text, octet_length(encode(text)) AS len,
        |                  unnest(range(0, 8)) AS fi
        |           FROM documents)
        |SELECT doc_id, CAST(fi AS INT) AS feature_idx,
        |       CASE WHEN len = 0 THEN CAST(0 AS REAL)
        |            ELSE CAST(len(list_filter(split(text, ''), c -> ascii(c) // 32 = fi)) AS REAL)
        |                 / CAST(len AS REAL) END AS feature
        |FROM f""".stripMargin
  )
}
