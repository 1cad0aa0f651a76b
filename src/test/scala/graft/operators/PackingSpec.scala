package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {

  test("distributed exclusive prefix sum equals the global-window form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // shuffled insert order: the operator must establish the order itself
    val rows = rnd.shuffle((0 until 20000).toList)
      .map(i => (i.toLong, rnd.nextInt(500) + 1))
    val df = rows.toDF("id", "tok").repartition(7)

    val got = Packing.cumSumBefore(df, Seq("id"), "tok")
      .select("id", "cum_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = df.withColumn("cb",
        coalesce(sum(col("tok")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "cb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got == expected)
  }

  test("packByTokenBudget bins where the token run starts") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1000), (2L, 1000), (3L, 1000), (4L, 48), (5L, 2048), (6L, 1))
      .toDF("doc_id", "n")
    val out = Packing.packByTokenBudget(df, Seq("doc_id"), "n", 2048L)
      .select("doc_id", "cum_before", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc3 starts at 2000 (< 2048) so it straddles into pack 0;
    // doc5 starts at 3048 → pack 1; doc6 starts at 5096 → pack 2
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 1000L, 0L), (3L, 2000L, 0L),
      (4L, 3000L, 1L), (5L, 3048L, 1L), (6L, 5096L, 2L)))
  }

  test("chunkTokens slides with overlap; short and empty docs behave") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than a chunk
      (3L, "   "),                                    // whitespace-only → none
      (4L, "")                                        // empty → none
    ).toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    // step 3, starts capped at len−overlap−1 = 8: 0,3,6 →
    // [w1..w4][w4..w7][w7..w10]; a start at 9 would emit [w10], which
    // is already chunk 2's overlap tail — no duplicate chunk
    assert(out.toSeq == Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 4L, "w7 w8 w9 w10"),
      (2L, 0L, 2L, "a b")))
    // overlap invariant: consecutive chunks share exactly `overlap` tokens
    val chunks1 = out.filter(_._1 == 1L).map(_._4.split(" ").toSeq).toSeq
    chunks1.sliding(2).foreach {
      case Seq(a, bchunk) => assert(a.takeRight(1) == bchunk.take(1))
      case _ =>
    }
  }

  test("assemblePacks concatenates members in order with exact accounting") {
    val s = spark
    import s.implicits._
    // budget 10: doc 1 (6) starts pack 0; doc 2 (5) starts at cum 6 →
    // still pack 0 (straddles into the next window); doc 3 (4) starts
    // at cum 11 → pack 1; doc 4 (empty, 0 tokens) shares doc 3's
    // offset window → pack 1
    val docs = Seq(
      (1L, "a b c d e f", 6L),
      (2L, "g h i j k", 5L),
      (3L, "l m n o", 4L),
      (4L, "", 0L)).toDF("doc_id", "text", "n_tokens")
    val out = graft.operators.Packing
      .assemblePacks(docs, "doc_id", "n_tokens", "text", budget = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out == Map(
      0L -> (2L, 11L, "a b c d e f g h i j k"),
      1L -> (2L, 4L, "l m n o ")), s"got $out")
  }

  test("assemblePacks denominated in BPE tokens bins on the kernel's counts") {
    val s = spark
    import s.implicits._
    // whitespace counting sees 2 tokens per doc; the BPE kernel fuses
    // per its merge table, so the two denominations pack differently —
    // proving the tokensCol is really threaded, not re-derived
    val docs = Seq(
      (1L, "the other"), (2L, "of straw"), (3L, "xy zq"))
      .toDF("doc_id", "text")
      .withColumn("n_ws", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("n_bpe", graft.functions.bpe_token_count(col("text")))
    val bpeCounts = docs.select("doc_id", "n_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sanity: BPE and whitespace denominations genuinely differ
    assert(bpeCounts.values.sum >
      docs.agg(sum("n_ws")).head.getLong(0))
    val budget = bpeCounts(1L) + 1 // doc 2 straddles, doc 3's start decides
    val out = graft.operators.Packing
      .packByTokenBudget(docs, Seq("doc_id"), "n_bpe", budget)
      .select("doc_id", "cum_before", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c1 = bpeCounts(1L)
    val c2 = bpeCounts(2L)
    val expected = Set(
      (1L, 0L, 0L),
      (2L, c1, c1 / budget),
      (3L, c1 + c2, (c1 + c2) / budget))
    assert(out == expected, s"got $out, counts $bpeCounts")
  }

  test("reserved __graft_ input columns are rejected, not silently dropped") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L)).toDF("id", "__graft_pid")
    val e = intercept[IllegalArgumentException](
      Packing.cumSumBefore(df, Seq("id"), "__graft_pid"))
    assert(e.getMessage.contains("__graft_"))
    intercept[IllegalArgumentException](
      Quantiles.exactQuantiles(df, Seq("id"), "__graft_pid", Seq(0.5)))
    intercept[IllegalArgumentException](
      graft.sources.Bronze.denseIds(df, Seq("id")))
  }
}
