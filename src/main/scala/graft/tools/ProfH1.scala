package graft.tools

import org.apache.spark.sql.functions._

// scratch profiler: break h1_hybrid_rrf into its stages and time each
// (warm passes), to see where the wall goes before reshaping the query.
//   sbt "runMain graft.tools.ProfH1"
object ProfH1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-h1", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profh1] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      graft.ManagedCache.release("TextSearch.bm25TopK")
      val lexScored = t("lex: bm25Scores (eager)") {
        graft.operators.TextSearch
          .bm25Scores(docs, "doc_id", "text", "spark vector stream join")
          .withColumn("rscore", round(col("score"), 6))
      }
      t("lex: top20 exec") {
        val wl = org.apache.spark.sql.expressions.Window
          .orderBy(col("rscore").desc, col("doc").asc)
        lexScored.orderBy(col("rscore").desc, col("doc").asc).limit(20)
          .withColumn("rank", row_number().over(wl))
          .select(col("doc").as("doc_id"), col("rank"))
          .write.format("noop").mode("overwrite").save()
      }
      t("sem: bruteForce exec") {
        graft.operators.AnnSearch.bruteForceTopK(
            emb.where(col("vec_id") === 0), emb, "vec_id", "embedding", k = 20)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
          .write.format("noop").mode("overwrite").save()
      }
      t("full h1 exec") {
        graft.SparkEntry.queries("h1_hybrid_rrf")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
