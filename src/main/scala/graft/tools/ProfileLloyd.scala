package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.AnnSearch

/** Where does quantizer-build time go at 1M docs? Seeds-only vs one vs two
  * Lloyd passes, interleaved rounds (same-JVM A/B discipline).
  * `sbt -J-Xmx10g "runMain graft.tools.ProfileLloyd"`. */
object ProfileLloyd {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, n.toLong)
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[lloyd] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val seeds = AnnSearch.ivfCentroids(c, 64, refine = false)
    for (round <- 1 to 3) {
      println(s"[lloyd] round $round")
      time("seeds_only")(AnnSearch.ivfCentroids(c, 64, refine = false).count())
      time("assign_only")(AnnSearch.ivfAssign(c, seeds).count())
      time("lloyd_x1")(AnnSearch.ivfCentroids(c, 64, refine = true, iterations = 1).count())
      time("lloyd_x2")(AnnSearch.ivfCentroids(c, 64, refine = true, iterations = 2).count())
    }
    spark.stop()
  }
}
