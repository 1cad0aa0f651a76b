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
          posexplode(col("features")).as(Seq("feature_idx", "feature")))),

    // Cross-video FRAME dedup (r12): the d12 repeated-unit operator is
    // unit-agnostic — here the exploded unit is a sampled binary frame
    // (m2's machinery, md5'd for an engine-portable unit key), and every
    // frame whose corpus-wide document frequency exceeds 1 is dropped
    // from ALL carriers (intro/outro cards, test patterns, rebroadcast
    // segments — the multimodal boilerplate d12 removes for text).
    // Scale shape inherits d12's: frequencies count on xxhash64(unit),
    // the hot set broadcasts size-guarded, the frame bytes never
    // shuffle. Deterministic md5 keys -> full DuckDB oracle (the m2
    // slicing CTE + a distinct-count filter).
    "m4_frame_dedup" -> ((s, dir) => {
      val frames = Multimodal.sampleFrames(
        t(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "bin", frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
      graft.operators.Dedup.dropRepeatedUnits(
        frames, "doc_id", "frame_md5", maxDocFreq = 1)
    })
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

    // the m2 slicing CTE, md5 frame keys, then the d12 semantics: keep
    // a frame occurrence iff its corpus-wide DISTINCT-doc frequency is
    // within the ceiling (spark counts on xxhash64(frame_md5) — same
    // key discipline d12's oracle already proved equivalent)
    "m4_frame_dedup" ->
      """WITH f AS (SELECT doc_id, text,
        |        unnest(range(0, CAST(floor(octet_length(encode(text)) / 64) AS BIGINT), 2)) AS fi
        |      FROM documents),
        |fr AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |         md5(substring(text, CAST(fi * 64 + 1 AS INT), 64)) AS frame_md5
        |       FROM f),
        |df AS (SELECT frame_md5, count(DISTINCT doc_id) AS d
        |       FROM fr GROUP BY frame_md5)
        |SELECT fr.doc_id, fr.frame_idx, fr.frame_md5
        |FROM fr JOIN df USING (frame_md5) WHERE d <= 1""".stripMargin,

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
