package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.AnnSearch
object ProfA9 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.Sessions.local("prof-a9", 32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    def tm[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a9] $tag%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[a9] ---- pass $pass")
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val sub = tm("pqSubDim head")(AnnSearch.pqSubDim(c, 8))
      val cms = tm("pqCodebooks (train)")(AnnSearch.pqCodebooks(c, 8, 32, sub))
      val c8 = tm("encode+cache")(graft.ManagedCache.swap("ProfA9.codes",
        c.select(col("neighbor_id"), AnnSearch.pqEncode(col("cv"), cms, sub).as("codes"))))
      tm("codes materialize")(c8.count())
      tm("full pqTopK")(
        AnnSearch.pqTopK(emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
          k = 5, m = 8, ksub = 32, rescoreMult = 10)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
