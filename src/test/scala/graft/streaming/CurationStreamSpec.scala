package graft.streaming

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation surface under Structured Streaming: the signal/gate/
  * split stages are stateless projections and filters, so the SAME
  * column expressions run unchanged on a stream — documents flowing in
  * from a live ingest get language-gated, quality-gated, and
  * split-assigned incrementally, matching the batch answers row for
  * row. (Dedup stages need state and stay batch or
  * mapGroupsWithState — s3_stream_dedup covers that path.) */
class CurationStreamSpec extends SparkTestBase {

  test("quality gate + hash split under readStream equal the batch plan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    def curate(df: org.apache.spark.sql.DataFrame) = {
      val gated = df.select(col("doc_id"), col("text"),
          langId(col("text")).as("lang_guess"),
          tokenCount(col("text")).as("n_words"))
        .where(col("lang_guess") =!= "und" && col("n_words").between(5, 1000))
      graft.operators.Splits.assignSplit(gated, "doc_id", "cs",
        Seq("val" -> 0.2, "train" -> 0.8))
    }

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "zz yy xx ww vv uu tt ss rr qq"),               // und → gated out
      (3L, "a ship sails to the harbor and the crew is glad"),
      (4L, "the end"),                                      // too short
      (5L, "el perro corre por la calle y la plaza de madrid"))

    val input = MemoryStream[(Long, String)]
    val query = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_out")
      .outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      query.processAllAvailable()
      input.addData(docs.drop(2): _*)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("curation_out")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSet
    val batch = curate(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 3L, 5L)) // gates fired
  }

  test("r10 model-signal kernels run unchanged under readStream") {
    // the classifier score (t12), BPE token count (c12), and the full
    // heuristic battery are stateless codegen kernels — a streaming
    // ingest can score/gate/price documents incrementally with the
    // exact batch values (the c11/c12 columns, minus the stateful
    // surprisal/dedup stages which need the corpus model)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.functions.linear_text_score(coalesce(col("text"), lit("")),
        graft.queries.TextQueries.qualityModelWeights).as("quality_score"),
      graft.functions.bpe_token_count(coalesce(col("text"), lit("")))
        .as("n_bpe_tokens"),
      langId(col("text")).as("lang_guess"))

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "streaming the theater and interesting strands are one"),
      (3L, ""),
      (4L, "el perro corre por la calle y la plaza de madrid"))

    val input = MemoryStream[(Long, String)]
    val query = score(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("model_signals_out")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
    } finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val streamed = rows(spark.table("model_signals_out"))
    val batch = rows(score(docs.toDF("doc_id", "text")))
    assert(streamed == batch, s"stream/batch split: $streamed vs $batch")
    assert(streamed.exists(_._3 > 0), "BPE counts must be non-trivial")
  }
}
