package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** Measures what residual encoding buys IVF-PQ at the SAME 40-bit code
  * budget — the r8 change that wired [[graft.functions.VecSub]] into
  * [[AnnSearch.ivfPqTopK]] (FAISS IndexIVFPQ shape): recall@5 vs the
  * exact baseline for `residual = false` (the r7 raw-vector codes) and
  * `residual = true`, at the a10 parameterization (nlist 16, nprobe 6,
  * m 8, ksub 32, rescoreMult 10), across scale factors.
  *
  * `sbt "runMain graft.tools.ResidualProbe"` → tools/residual_probe_r8.txt.
  * Not part of the driver contract. */
object ResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("residual-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")

    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.where(col("vec_id") % 50 === 0)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(AnnSearch.bruteForceTopK(q, emb, "vec_id",
        "embedding", k = 5))
      def recall(residual: Boolean): Double = {
        val got = pairs(AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32,
          rescoreMult = 10, residual = residual))
        (exact intersect got).size.toDouble / exact.size
      }
      val raw = recall(residual = false)
      val res = recall(residual = true)
      println(f"[residual] $sf%-8s raw=$raw%.4f residual=$res%.4f " +
        f"delta=${res - raw}%+.4f (n_queries=${q.count()}, 40-bit codes)")
    }
    spark.stop()
  }
}
