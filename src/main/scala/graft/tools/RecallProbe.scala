package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.operators.AnnSearch

/** One-off recall measurement for the IVF quantizer refinement: recall@5
  * of ivfTopK vs the exact baseline at both test scales, refined vs raw
  * seeds, across nprobe. Usage: `sbt "runMain graft.tools.RecallProbe"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("recall-probe")
    try {
      for (dir <- Seq("sf0.001", "sf0.01")) {
        val emb = spark.read.parquet(s"/root/testdata/$dir/embeddings.parquet")
        val q = emb.where(col("vec_id") % 50 === 0)
        val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id")
        val denom = exact.count().toDouble
        def recall(approx: DataFrame): Double =
          exact.join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count() / denom
        for (iters <- Seq(1, 2, 3); nprobe <- Seq(6)) {
          val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
          val cents = AnnSearch.ivfCentroids(c, 16, refine = true,
            iterations = iters)
          val q0 = q.select(col("vec_id").as("query_id"),
            col("embedding").as("qv"))
          val r = recall(AnnSearch.ivfTopKFromAssigned(q0,
            AnnSearch.ivfAssign(c, cents), cents, 5, nprobe))
          println(s"RECALL dir=$dir iters=$iters nprobe=$nprobe r=$r")
        }
      }
    } finally spark.stop()
  }
}
