package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Job-count A/B for the r12 hint-discipline closure (VERDICT r11 task
  * 8): (a) knnJoinIvfPq gains dimHint — with (rowCountHint, dimHint)
  * both of its per-call stat probes are gone; (b) h3 now supplies the
  * memoized feature-table count alongside dimHint; (c) the persisted
  * IVF-PQ from-index query path derives (m, sub) from the
  * fingerprint-cached book rows instead of running a countDistinct/max
  * aggregation JOB per call. Output committed as tools/knnhint_r12.txt. */
object HintProbeR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("hint-probe-r12", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()

    def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Thread.sleep(500); jobs.set(0)
      val t0 = System.nanoTime()
      val rows = df.count()
      Thread.sleep(500) // listener posts async
      println(f"[hintprobe] $name%-26s jobs ${jobs.get()}%3d  " +
        f"${(System.nanoTime() - t0) / 1e9}%5.2f s  rows $rows")
    }

    for (trial <- 1 to 2) {
      println(s"[hintprobe] --- trial $trial ($sfDir, n=$n) ---")
      run("ivfpq no hints")(graft.operators.AnnSearch.knnJoinIvfPq(
        emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 6))
      run("ivfpq rowCountHint")(graft.operators.AnnSearch.knnJoinIvfPq(
        emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 6,
        rowCountHint = n))
      run("ivfpq both hints")(graft.operators.AnnSearch.knnJoinIvfPq(
        emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 6,
        rowCountHint = n, dimHint = 32))
    }

    // the persisted-index query path: after the first call warms the
    // cent/book caches, a repeat query must launch no stat job at all —
    // only the probe/candidate/rescore jobs of the query itself
    val ixPath = java.nio.file.Files
      .createTempDirectory("hintprobe-ivfpq").toString
    graft.pipeline.SilverIndex.refreshIvfPq(
      emb, "vec_id", "embedding", nlist = 16, m = 8, ksub = 32,
      path = ixPath)
    val q = emb.where(col("vec_id") % 50 === 0)
    for (call <- 1 to 3)
      run(s"fromIndex call $call")(
        graft.pipeline.SilverIndex.ivfPqTopKFromIndex(
          q, emb, "vec_id", "embedding", ixPath, k = 5, nprobe = 6))
    spark.stop()
  }
}
