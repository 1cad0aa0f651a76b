package graft.tools

import org.apache.spark.sql.functions._

/** Scratch parity check: joint multi-subspace PQ codebook training must be
  * bit-identical to the per-subspace ivfCentroids loop it replaced. */
object PqParity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("pq-parity", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    for ((m, ksub) <- Seq((8, 32), (4, 16))) {
      val sub = graft.operators.AnnSearch.pqSubDim(c, m)
      val neu = graft.operators.AnnSearch.pqCodebookFrames(c, m, ksub, sub)
      // the old formulation, inline
      val old = (0 until m).map { j =>
        val cj = c.select(col("neighbor_id"),
          slice(col("cv"), j * sub + 1, sub).as("cv"))
        graft.operators.AnnSearch.ivfCentroids(cj, ksub)
      }
      var allOk = true
      (0 until m).foreach { j =>
        val a = neu(j).orderBy("list_id").collect().toSeq
        val b = old(j).orderBy("list_id").collect().toSeq
        val same = a.size == b.size && a.zip(b).forall { case (x, y) =>
          x.get(0) == y.get(0) &&
            x.getAs[Seq[Any]](1) == y.getAs[Seq[Any]](1)
        }
        if (!same) { allOk = false; println(s"[pq-parity] m=$m sub $j MISMATCH (${a.size} vs ${b.size})") }
      }
      println(s"[pq-parity] m=$m ksub=$ksub: " + (if (allOk) "IDENTICAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
