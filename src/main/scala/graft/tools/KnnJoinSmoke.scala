package graft.tools

import org.apache.spark.sql.functions._

/** kNN self-join smoke: the whole corpus as its own query set through
  * the partitioned list_id join — the shape a broadcast-probes ivfTopK
  * cannot run (a corpus-sized probe side has no broadcastable form;
  * measured here by also timing ivfTopK(corpus, corpus), whose probe
  * broadcast carries n×nprobe full vectors through the driver).
  *   sbt "runMain graft.tools.KnnJoinSmoke [n] [nlist] [nprobe]"
  */
object KnnJoinSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.fold(100000)(_.toInt)
    val nlist = args.drop(1).headOption.fold(256)(_.toInt)
    val nprobe = args.drop(2).headOption.fold(8)(_.toInt)
    val passes = args.drop(3).headOption.fold(2)(_.toInt)
    val spark = graft.Sessions.local("knn-smoke", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, n)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knnsmoke] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to passes).foreach { pass =>
      println(s"--- pass $pass (n=$n nlist=$nlist nprobe=$nprobe)")
      val knn = timed(s"knnJoinIvf (partitioned join)") {
        graft.operators.AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
          k = 5, nlist = nlist, nprobe = nprobe)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"knnJoinIvfPq (ADC candidates)") {
        graft.operators.AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
          k = 5, nlist = nlist, nprobe = nprobe, m = 8, ksub = 32,
          rescoreMult = 10)
          .write.format("noop").mode("overwrite").save()
      }
      // agreement of the PQ graph with the float-candidate graph on a
      // query sample (approximate pre-rescore, so report, don't assert)
      val pqS = graft.operators.AnnSearch.knnJoinIvfPq(emb, "vec_id",
          "embedding", k = 5, nlist = nlist, nprobe = nprobe, m = 8,
          ksub = 32, rescoreMult = 10)
        .where(col("query_id") % 200 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val fS = graft.operators.AnnSearch.knnJoinIvf(emb, "vec_id",
          "embedding", k = 5, nlist = nlist, nprobe = nprobe)
        .where(col("query_id") % 200 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[knnsmoke] PQ graph overlap vs float candidates: " +
        f"${(pqS intersect fS).size.toDouble / fS.size}%.4f")
      timed(s"ivfTopK(corpus, corpus) (bcast probes)") {
        graft.operators.AnnSearch.ivfTopK(emb, emb, "vec_id", "embedding",
          k = 5, nlist = nlist, nprobe = nprobe)
          .write.format("noop").mode("overwrite").save()
      }
      // sampled-equality check between the two shapes (full compare at
      // this n is another output-sized job; a 1/200 sample catches any
      // systematic divergence)
      val a = graft.operators.AnnSearch.knnJoinIvf(emb, "vec_id",
          "embedding", k = 5, nlist = nlist, nprobe = nprobe)
        .where(col("query_id") % 200 === 0)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val b = graft.operators.AnnSearch.ivfTopK(
          emb.where(col("vec_id") % 200 === 0), emb, "vec_id", "embedding",
          k = 5, nlist = nlist, nprobe = nprobe)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      println(s"[knnsmoke] sampled equality vs broadcast shape: ${a == b} " +
        s"(${a.size} rows)")
      require(a == b, "shape divergence")
    }
    spark.stop()
  }
}
