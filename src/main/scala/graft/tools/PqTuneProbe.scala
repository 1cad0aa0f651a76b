package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** The measured recall-vs-bytes curve behind the r9 IVF-PQ retuning
  * (VERDICT r8 task 1): sweep (m, ksub, rescoreMult) at the 100k
  * structureless-synthetic smoke corpus (the ScaleCanary corpus — the
  * adversarial clusterless case where the r8 floor sat at 0.25) and at
  * sf0.1, reporting recall@5 vs the exact baseline, wall seconds, and
  * the code budget in bits/vector. The IVF-flat run at the same
  * (nlist, nprobe) is the coarse-pruning ceiling no code budget can
  * exceed.
  *
  * `sbt "runMain graft.tools.PqTuneProbe [n]"` → tools/pqtune_r9.txt.
  * Not part of the driver contract. */
object PqTuneProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    require(n >= 100, s"need n >= 100 (the query set is vec_id % (n/100)), got $n")
    val spark = graft.Sessions.local("pqtune-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val emb = SyntheticScale.embeddings(spark, n)
    val q = emb.where(col("vec_id") % (n / 100) === 0)
    val (nlist, nprobe) = (64, 8)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(AnnSearch.bruteForceTopK(q, emb, "vec_id",
      "embedding", k = 5))
    println(s"[pqtune] corpus=$n queries=${exact.size / 5} nlist=$nlist " +
      s"nprobe=$nprobe k=5 (recall vs exact brute force)")

    // the pruning ceiling: exact float scoring inside probed lists
    val t0 = System.nanoTime()
    val flat = pairs(AnnSearch.ivfTopK(q, emb, "vec_id", "embedding",
      k = 5, nlist = nlist, nprobe = nprobe))
    val rFlat = (exact intersect flat).size.toDouble / exact.size
    println(f"[pqtune] ivf-flat ceiling          recall=$rFlat%.3f " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s  bytes/vec=512 (float64x64)")

    val grid: Seq[(Int, Int, Int)] =
      if (args.length > 1 && args(1) == "rescore")
        Seq((8, 32, 20), (8, 32, 40), (8, 32, 80), (8, 32, 160),
          (8, 64, 40), (16, 32, 40))
      else Seq(
        (8, 32, 10),   // r8 default: 40-bit codes
        (8, 32, 40),   // r8 codes, deeper exact rescore
        (4, 256, 10),  // 32-bit codes, 8 bits/sub
        (4, 1024, 10), // 40-bit codes re-spent: 10 bits/sub
        (4, 1024, 40),
        (8, 64, 10),   // 48-bit codes
        (8, 256, 10),  // 64-bit codes
        (16, 32, 10))  // 80-bit codes
    for ((m, ksub, mult) <- grid) {
      graft.ManagedCache.releaseAll()
      val t1 = System.nanoTime()
      val got = pairs(AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
        k = 5, nlist = nlist, nprobe = nprobe, m = m, ksub = ksub,
        rescoreMult = mult))
      val r = (exact intersect got).size.toDouble / exact.size
      val bits = m * (math.log(ksub) / math.log(2)).round
      println(f"[pqtune] m=$m%-2d ksub=$ksub%-4d mult=$mult%-2d   " +
        f"recall=$r%.3f wall=${(System.nanoTime() - t1) / 1e9}%6.2f s  " +
        f"bits/vec=$bits")
    }
    spark.stop()
  }
}
