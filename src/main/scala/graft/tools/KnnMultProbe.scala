package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** Recall/wall A/B for [[AnnSearch.knnJoinIvfPq]]'s r10 auto-tuned
  * rescore depth (tools/knnmult_r10.txt): at 100k docs, mult = 10
  * (the r8 floor), the auto-derived depth, and 40 (the query-set
  * optimum), each measured for wall time and for recall against the
  * FLOAT-resolution candidates at the same pruning (knnJoinIvf — the
  * axis the rescore depth actually moves; coarse pruning loss is
  * common to both). Not part of the driver contract. */
object KnnMultProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.fold(100000)(_.toInt)
    val spark = graft.Sessions.local("knn-mult-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, n.toLong)
    val (k, nlist, nprobe) = (5, 64, 8)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t0 = System.nanoTime()
    val ref = pairs(AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
      k, nlist, nprobe))
    println(f"[knnmult] float reference     ${(System.nanoTime() - t0) / 1e9}%6.1f s  ${ref.size} pairs")

    val conf = spark.sessionState.conf
    val auto = AnnSearch.knnJoinRescoreMult(n.toLong, k,
      conf.numShufflePartitions, conf.filesMaxPartitionBytes)
    println(s"[knnmult] auto depth at n=$n k=$k: $auto " +
      s"(partitions=${conf.numShufflePartitions}, " +
      s"maxPartitionBytes=${conf.filesMaxPartitionBytes})")

    for (mult <- Seq(10, auto, 40).distinct) {
      val t = System.nanoTime()
      val got = pairs(AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
        k, nlist, nprobe, m = 8, ksub = 32, rescoreMult = mult,
        rowCountHint = n.toLong))
      val wall = (System.nanoTime() - t) / 1e9
      val recall = (ref & got).size.toDouble / ref.size
      println(f"[knnmult] mult=$mult%-3d wall $wall%6.1f s  recall-vs-float $recall%.4f")
    }
    spark.stop()
  }
}
