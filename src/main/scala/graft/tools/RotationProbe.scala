package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** Does a PQ-side ROTATION buy recall on this corpus? The OPQ family
  * (Ge et al. 2013) learns an orthogonal R to balance subspace energy
  * before product quantization; the classic cheap baseline is a RANDOM
  * orthogonal rotation (Jégou et al.'s RR). An orthogonal R preserves
  * cosine, so the exact baseline is unchanged and recall deltas are
  * directly attributable to the rotation. On structureless iid-uniform
  * vectors the energy is already balanced across dims, so the expected
  * gain is ~zero — this probe MEASURES that expectation instead of
  * asserting it (the r9 pqtune log's remaining hole).
  *
  * `sbt "runMain graft.tools.RotationProbe [n]"` → tools/pqtune_r9.txt
  * addendum. Not part of the driver contract. */
object RotationProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    require(n >= 100, s"need n >= 100, got $n")
    val spark = graft.Sessions.local("rotation-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    // seeded random orthogonal matrix: Gram-Schmidt over a Gaussian
    val rnd = new scala.util.Random(20260814L)
    val a = Array.fill(dim, dim)(rnd.nextGaussian())
    val r = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim) {
      val v = a(i).clone()
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => v(k) * r(j)(k)).sum
        for (k <- 0 until dim) v(k) -= d * r(j)(k)
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      r(i) = v.map(_ / norm)
    }
    val rB = spark.sparkContext.broadcast(r)
    val rotate = udf { (v: Seq[Double]) =>
      val m = rB.value
      Array.tabulate(dim) { i =>
        var s = 0.0; var k = 0
        while (k < dim) { s += m(i)(k) * v(k); k += 1 }
        s
      }.toSeq
    }

    val emb = SyntheticScale.embeddings(spark, n)
    val q = emb.where(col("vec_id") % (n / 100) === 0)
    val embR = emb.select(col("vec_id"), rotate(col("embedding")).as("embedding"))
      .repartition(64).cache()
    embR.count()
    val qR = embR.where(col("vec_id") % (n / 100) === 0)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet

    // exact baseline on the ORIGINAL vectors (orthogonal R preserves
    // cosine, so the rotated corpus has the same true neighbors)
    val exact = pairs(AnnSearch.bruteForceTopK(q, emb, "vec_id",
      "embedding", k = 5))
    println(s"[rot] corpus=$n queries=${exact.size / 5} nlist=64 nprobe=8 " +
      "m=8 ksub=32 mult=10 (the code-quality regime)")
    def recall(c: org.apache.spark.sql.DataFrame,
        qs: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(AnnSearch.ivfPqTopK(qs, c, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 8, m = 8, ksub = 32, rescoreMult = 10))
      val rr = (exact intersect got).size.toDouble / exact.size
      println(f"[rot] $tag%-22s recall=$rr%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      graft.ManagedCache.releaseAll()
    }
    recall(emb, q, "identity (no rotation)")
    recall(embR, qR, "random orthogonal R")
    spark.stop()
  }
}
