package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for the a6_incr_ivf gate query: where do the seconds go
  * between the two refreshes and the probe? `sbt "runMain
  * graft.tools.ProfA6 [sfdir]"`. Not part of the driver contract. */
object ProfA6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-a6", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[a6] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warm the session
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val path = java.nio.file.Files
        .createTempDirectory("prof-a6").toString + "/ix"
      timed("refresh#1 (75%, builds)") {
        graft.pipeline.SilverIndex.refreshIvf(
          emb.where(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
          nlist = 16, path = path)
      }
      timed("refresh#2 (delta 25%)") {
        graft.pipeline.SilverIndex.refreshIvf(emb, "vec_id", "embedding",
          nlist = 16, path = path)
      }
      val out = timed("probe from index (plan)") {
        graft.pipeline.SilverIndex.ivfTopKFromIndex(
          emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding",
          path, k = 5, nprobe = 6)
      }
      timed("probe execute")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

/** Sub-phase timing of refreshIvf's first build. */
object ProfA6Build {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof-a6b", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[a6b] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .where(col("vec_id") % 4 =!= 0)
      val path = java.nio.file.Files
        .createTempDirectory("prof-a6b").toString + "/ix"
      val c = timed("ivfCorpus")(
        graft.operators.AnnSearch.ivfCorpus(emb, "vec_id", "embedding"))
      val seeds = timed("seeds (TakeOrdered+collect)") {
        c.withColumn("__h", xxhash64(col("neighbor_id")))
          .orderBy(col("__h"), col("neighbor_id")).limit(16)
          .select(col("neighbor_id").as("list_id"), col("cv").as("centv"))
          .collect()
      }
      val cents = timed("ivfCentroids (full)")(
        graft.operators.AnnSearch.ivfCentroids(c, 16))
      timed("write centroids")(
        cents.write.mode("overwrite").parquet(s"$path/centroids"))
      timed("assign+repartition+write") {
        graft.operators.AnnSearch.ivfAssign(c, cents)
          .repartition(col("list_id"))
          .write.mode("append").partitionBy("list_id")
          .parquet(s"$path/assigned")
      }
      timed("total count")(spark.read.parquet(s"$path/assigned").count())
      println(s"seeds=${seeds.length}")
    }
    spark.stop()
  }
}
