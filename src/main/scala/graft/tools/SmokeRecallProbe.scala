package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** Isolates the r8 smoke-scale IVF-PQ recall drop: residual on/off ×
  * sampled/full quantizer training at the canary corpus (100k synthetic
  * embeddings, nlist 64, nprobe 8, m 8, ksub 32). Scratch diagnostic. */
object SmokeRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("smoke-recall", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, 100000L)
    val q = emb.where(col("vec_id") % 1000 === 0)
    val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(residual: Boolean): Double = {
      val got = AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 64, nprobe = 8, m = 8, ksub = 32, rescoreMult = 10,
        residual = residual)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    println(s"[smoke] residual=true  sampled: ${recall(true)}")
    println(s"[smoke] residual=false sampled: ${recall(false)}")
    // IVF alone for reference
    val ivf = AnnSearch.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
      nlist = 64, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[smoke] ivf-flat sampled: ${(exact intersect ivf).size.toDouble / exact.size}")
    spark.stop()
  }
}

/** Same probe with the training cap lifted (full-corpus quantizers) —
  * isolates sampling from residual encoding. */
object SmokeRecallProbeFull {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("smoke-recall-full", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, 100000L)
    val q = emb.where(col("vec_id") % 1000 === 0)
    val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run(maxTrain: Int): Unit = {
      val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
      val sub = AnnSearch.pqSubDim(c, 8)
      val cents = AnnSearch.ivfCentroids(c, 64, maxTrain = maxTrain)
      val assigned = AnnSearch.ivfAssign(c, cents)
      val train = assigned.join(broadcast(cents), "list_id")
        .select(col("neighbor_id"), col("list_id"), col("centv"),
          graft.functions.VectorFunctions.sub(col("cv"), col("centv")).as("cv"))
      val cms = AnnSearch.pqCodebooks(train.select("neighbor_id", "cv"), 8, 32, sub)
      // reuse the public path for scoring by persisting nothing: inline
      val coded = train.withColumn("codes", AnnSearch.pqEncode(col("cv"), cms, sub))
      val c8 = graft.ManagedCache.swap("probe.codes",
        coded.select(col("neighbor_id"), col("list_id"), col("codes"),
          AnnSearch.pqReconNorm2(col("centv"), col("codes"), cms, sub).as("rnorm2")))
      val q0 = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val probes = AnnSearch.probeLists(q0, cents, 8)
        .join(broadcast(cents), "list_id")
        .withColumn("__qcdot", graft.functions.VectorFunctions.dot(col("qv"), col("centv")))
        .drop("centv")
        .withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), cms, sub))
        .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
      val cand = broadcast(probes).join(c8, "list_id")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("qscore", AnnSearch.pqAdcCosineStored(col("__lut"),
          col("__qn"), col("__qcdot"), col("codes"), col("rnorm2"), cms))
      val got = AnnSearch.exactRescore(AnnSearch.pqCandTop(cand, 50), c, q0, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[smokefull] maxTrain=$maxTrain recall=${(exact intersect got).size.toDouble / exact.size}")
    }
    run(1 << 16)
    run(1 << 20)
    spark.stop()
  }
}

/** A/B: TopKByKey aggregate vs row_number window on the SAME scored
  * candidates at smoke scale — is the r7 bounded ranking the variable? */
object SmokeTopKParity {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("smoke-topk", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val emb = SyntheticScale.embeddings(spark, 100000L)
    val q = emb.where(col("vec_id") % 1000 === 0)
    val qq = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .repartition(32, col("neighbor_id"))
    val scored = broadcast(qq).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", graft.functions.VectorFunctions.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cosine")
    val viaAgg = AnnSearch.rankedTopK(scored, "query_id", "neighbor_id", "cosine", 5)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val viaWin = scored.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[topk] agg=${viaAgg.size} win=${viaWin.size} " +
      s"agg==win=${viaAgg == viaWin} missRate=${(viaWin -- viaAgg).size.toDouble / viaWin.size}")
    spark.stop()
  }
}

/** The missing 2x2 cell: RAW codes with FULL-corpus training — the r7
  * configuration — vs raw+sampled, at the canary parameterization. */
object SmokeRawFull {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("smoke-rawfull", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, 100000L)
    val q = emb.where(col("vec_id") % 1000 === 0)
    val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run(maxTrain: Int): Unit = {
      val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
      val sub = AnnSearch.pqSubDim(c, 8)
      val cents = AnnSearch.ivfCentroids(c, 64, maxTrain = maxTrain)
      val assigned = AnnSearch.ivfAssign(c, cents)
      val train = assigned.select(col("neighbor_id"), col("list_id"), col("cv"))
      val cms = AnnSearch.pqCodebookFrames(train.select("neighbor_id", "cv"),
        8, 32, sub, maxTrain = maxTrain).map(AnnSearch.centMatrix)
      val coded = train.withColumn("codes", AnnSearch.pqEncode(col("cv"), cms, sub))
      val c8 = graft.ManagedCache.swap("probe.codes.raw",
        coded.select(col("neighbor_id"), col("list_id"), col("codes"),
          AnnSearch.pqCodeNorm2(col("codes"), cms).as("rnorm2")))
      val q0 = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val probes = AnnSearch.probeLists(q0, cents, 8)
        .withColumn("__qcdot", lit(0.0))
        .withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), cms, sub))
        .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
      val cand = broadcast(probes).join(c8, "list_id")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("qscore", AnnSearch.pqAdcCosineStored(col("__lut"),
          col("__qn"), col("__qcdot"), col("codes"), col("rnorm2"), cms))
      val got = AnnSearch.exactRescore(AnnSearch.pqCandTop(cand, 50), c, q0, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[rawfull] maxTrain=$maxTrain recall=${(exact intersect got).size.toDouble / exact.size}")
    }
    run(1 << 16)
    run(1 << 20)
    spark.stop()
  }
}
