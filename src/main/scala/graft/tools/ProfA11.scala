package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing for the a11 contract battery: which of the four
  * contract rows carries the wall? `sbt "runMain graft.tools.ProfA11"`.
  * Not part of the driver contract. */
object ProfA11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-a11", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a11] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    val q = emb.where(col("vec_id") % 50 === 0)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      graft.ManagedCache.releaseAll()
      t("exact brute (recall baseline)") {
        graft.operators.AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
          .write.format("noop").mode("overwrite").save()
      }
      t("ivfPqTopK mult=40 (recall row)") {
        graft.operators.AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32, rescoreMult = 40)
          .write.format("noop").mode("overwrite").save()
      }
      t("knnJoinIvf (equiv left)") {
        graft.operators.AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6)
          .where(col("query_id") % 50 === 0)
          .write.format("noop").mode("overwrite").save()
      }
      t("ivfTopK bcast (equiv right)") {
        graft.operators.AnnSearch.ivfTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6)
          .write.format("noop").mode("overwrite").save()
      }
      t("clusterNearDupPairs + accounting") {
        val pairs = graft.operators.AnnSearch.clusterNearDupPairs(
          emb, "vec_id", "embedding", theta = 0.45, nlist = 16)
        pairs.write.format("noop").mode("overwrite").save()
      }
      t("semanticDedup (survivors)") {
        graft.operators.AnnSearch.semanticDedup(emb, "vec_id", "embedding",
          theta = 0.45, nlist = 16)
          .write.format("noop").mode("overwrite").save()
      }
      t("full a11 exec") {
        graft.SparkEntry.queries("a11_ann_contracts")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
