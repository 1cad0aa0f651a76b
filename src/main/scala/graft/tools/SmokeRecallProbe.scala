package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** The r8 canary-floor investigation harness (see
  * tools/scale_canary_r8.txt): isolates WHY smoke-scale IVF-PQ recall
  * sits where it does at the 100k canary corpus by running the 2×2 of
  * {residual, raw} × {sampled, full-corpus} quantizer training, plus a
  * TopKByKey-vs-window ranking parity check on the same scored
  * candidates — the experiment that established the r6-written 0.35
  * floor had never been validated and that residual encoding raises the
  * honest number 0.198 → 0.25.
  *
  *   sbt "runMain graft.tools.SmokeRecallProbe [cells|topk] [nDocs]"
  *
  * `cells` (default) prints the recall cells; `topk` prints the ranking
  * parity. Not part of the driver contract. */
object SmokeRecallProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cells")
    val n = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = graft.Sessions.local("smoke-recall", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, n)
    val q = emb.where(col("vec_id") % 1000 === 0)
    val qq = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(AnnSearch.bruteForceTopK(q, emb, "vec_id",
      "embedding", 5))

    if (mode == "topk") {
      // ranking parity: the bounded aggregate vs the row_number window
      // over the SAME scored candidates
      import org.apache.spark.sql.expressions.Window
      val c = emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))
        .repartition(32, col("neighbor_id"))
      val scored = broadcast(qq).crossJoin(c)
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          graft.functions.VectorFunctions.cosine(col("qv"), col("cv")))
        .select("query_id", "neighbor_id", "cosine")
      val viaAgg = pairs(AnnSearch.rankedTopK(scored, "query_id",
        "neighbor_id", "cosine", 5))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val viaWin = scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[topk] agg=${viaAgg.size} win=${viaWin.size} " +
        s"agg==win=${viaAgg == viaWin}")
      spark.stop(); return
    }

    /** One cell: recall@5 of IVF-PQ at the canary parameterization with
      * the given encoding and training cap, through the SAME internals
      * the public operator composes. */
    def cell(residual: Boolean, maxTrain: Int): Double = {
      val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
      val sub = AnnSearch.pqSubDim(c, 8)
      val cents = AnnSearch.ivfCentroids(c, 64, maxTrain = maxTrain)
      val assigned = AnnSearch.ivfAssign(c, cents)
      val train =
        if (residual)
          assigned.join(broadcast(cents), "list_id")
            .select(col("neighbor_id"), col("list_id"), col("centv"),
              graft.functions.VectorFunctions.sub(col("cv"), col("centv"))
                .as("cv"))
        else assigned.select(col("neighbor_id"), col("list_id"), col("cv"))
      val cms = AnnSearch.pqCodebookFrames(train.select("neighbor_id", "cv"),
        8, 32, sub, maxTrain = maxTrain).map(AnnSearch.centMatrix)
      val coded = train.withColumn("codes",
        AnnSearch.pqEncode(col("cv"), cms, sub))
      val rn2 =
        if (residual) AnnSearch.pqReconNorm2(col("centv"), col("codes"),
          cms, sub)
        else AnnSearch.pqCodeNorm2(col("codes"), cms)
      val c8 = graft.ManagedCache.swap("probe.codes",
        coded.select(col("neighbor_id"), col("list_id"), col("codes"),
          rn2.as("rnorm2")))
      val probes0 = AnnSearch.probeLists(qq, cents, 8)
      val probes1 =
        if (residual)
          probes0.join(broadcast(cents), "list_id")
            .withColumn("__qcdot", graft.functions.VectorFunctions
              .dot(col("qv"), col("centv"))).drop("centv")
        else probes0.withColumn("__qcdot", lit(0.0))
      val probes = probes1
        .withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), cms, sub))
        .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
      val cand = broadcast(probes).join(c8, "list_id")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("qscore", AnnSearch.pqAdcCosineStored(col("__lut"),
          col("__qn"), col("__qcdot"), col("codes"), col("rnorm2"), cms))
      val got = pairs(AnnSearch.exactRescore(
        AnnSearch.pqCandTop(cand, 50), c, qq, 5))
      (exact intersect got).size.toDouble / exact.size
    }

    for (res <- Seq(true, false); cap <- Seq(1 << 16, 1 << 20))
      println(f"[cell] residual=$res%-5s maxTrain=$cap%7d " +
        f"recall@5=${cell(res, cap)}%.4f")
    spark.stop()
  }
}
