package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Stage breakdown for c11_curation_ccnet at sf0.1 (r10). Mirrors the
  * query's construction to see where the wall goes. Not part of the
  * driver contract. */
object ProfC11 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-c11", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[c11] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    tm("warmup q1")(noop(graft.SparkEntry.queries("q1_agg")(spark, sfDir)))
    tm("provision bm25 index")(
      graft.queries.TextQueries.bm25IndexPath(spark, sfDir))
    (1 to 2).foreach { pass =>
      println(s"[c11] ---- pass $pass")
      val s = spark
      val docs = graft.queries.Tables.t(s, sfDir, "documents")
        .transform(graft.operators.Par.spread(_, col("doc_id")))
      val total2g = greatest(tokenCount(col("text")) - 1, lit(0))
      val signals = tm("signals persist")(graft.ManagedCache.swap(
        "ProfC11.signals",
        docs.select(
            col("doc_id"), col("text"),
            graft.functions.word_shingles(col("text"), 2).as("sh"),
            langId(col("text")).as("lang_guess"),
            tokenCount(col("text")).as("n_words"),
            total2g.as("__t2g"),
            graft.functions.linear_text_score(
              coalesce(col("text"), lit("")),
              graft.queries.TextQueries.qualityModelWeights)
              .as("quality_score"))
          .withColumn("rep", when(col("__t2g") === 0, lit(0.0))
            .otherwise(lit(1.0) - size(col("sh")).cast("double")
              / col("__t2g").cast("double")))
          .drop("__t2g")))
      tm("signals materialize")(signals.count())
      val gated = signals.where(col("lang_guess") =!= "und" &&
        col("n_words").between(20, 1000) && col("rep") <= 0.1 &&
        col("quality_score") >= 0)
      val nll = tm("surprisal construct")(
        graft.operators.TextSearch.surprisalFromIndexFor(
          graft.pipeline.SilverIndex.postingsIndex(s,
            graft.queries.TextQueries.bm25IndexPath(s, sfDir)),
          gated.select(col("doc_id")))
        .select(col("doc").as("doc_id"),
          round(col("mean_nll"), 6).as("rnll")))
      val bucketed = gated.join(nll, "doc_id")
        .withColumn("nll_bucket",
          when(col("rnll") < 3.3998, lit("head"))
            .when(col("rnll") < 3.4041, lit("middle"))
            .otherwise(lit("tail")))
        .where(col("nll_bucket") =!= "tail")
      tm("bucketed count")(bucketed.count())
      val kept = bucketed.join(
        Dedup.exact(bucketed, "text", "doc_id")
          .select(col("kept_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val pairs = tm("jaccard pairs construct")(
        Dedup.jaccardPairsBy(kept, "doc_id", col("sh"), theta = 0.5))
      tm("final exec")(noop(
        Dedup.dropNearDups(kept, "doc_id", pairs)
          .select(col("doc_id"), col("lang_guess"), col("n_words"),
            col("quality_score"), col("nll_bucket"))))
    }
    spark.stop()
  }
}
