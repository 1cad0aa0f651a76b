package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** r10 stage breakdown INSIDE ivfPqTopK for the a11 contract query —
  * which of the construction-time driver actions carry the 2s warm
  * wall at sf0.1. Not part of the driver contract. */
object ProfA11b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-a11b", 32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    def tm[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a11b] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[a11b] ---- pass $pass")
      val c = tm("ivfCorpus")(AnnSearch.ivfCorpus(emb, "vec_id", "embedding"))
      val cents = tm("ivfCentroids (coarse train)")(
        AnnSearch.ivfCentroids(c, 16))
      tm("cents collect")(cents.count())
      val sub = tm("pqSubDim")(AnnSearch.pqSubDim(c, 8))
      val cms = tm("pqCodebooks (train+matrix)")(
        AnnSearch.pqCodebooks(c, 8, 32, sub))
      val q = emb.where(col("vec_id") % 50 === 0)
      tm("full ivfPqTopK mult=40")(
        AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32,
          rescoreMult = 40)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
