package graft.tools

import org.apache.spark.sql.functions._

/** One-off parameter sweep for pqTopK recall (committed like the other
  * tools/ probes; output log goes to tools/pqprobe_r6.txt). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("pq-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") % 50 === 0)
    val exact = graft.operators.AnnSearch
      .bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      m <- Seq(4, 8, 16)
      ksub <- Seq(16, 32)
      rm <- Seq(4, 10)
    } {
      val t0 = System.nanoTime()
      val got = graft.operators.AnnSearch.pqTopK(q, emb, "vec_id",
          "embedding", k = 5, m = m, ksub = ksub, rescoreMult = rm)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect got).size.toDouble / exact.size
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"m=$m%2d ksub=$ksub%2d rescoreMult=$rm%2d  recall@5=$recall%.3f  ${secs}%.1f s")
    }
    spark.stop()
  }
}
