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
}
