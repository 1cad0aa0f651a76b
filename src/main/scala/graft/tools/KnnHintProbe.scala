package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Job-count A/B for the knnJoin stat hints (VERDICT r10 task 5): the
  * auto-dispatcher without hints runs a first-row dim probe plus a
  * corpus count BEFORE planning the join — two extra jobs per call, and
  * the count re-runs the corpus lineage (a full scan when the corpus
  * isn't a bare parquet read). With the a14 closure supplying
  * (rowCountHint, dimHint) from the per-JVM stats memo, the probe jobs
  * are gone. Output committed as tools/knnhint_r11.txt. */
object KnnHintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("knn-hint-probe", 32)
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
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)

    def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Thread.sleep(500); jobs.set(0)
      val t0 = System.nanoTime()
      val rows = df.count()
      Thread.sleep(500) // listener posts async
      println(f"[knnhint] $name%-18s jobs ${jobs.get()}%3d  " +
        f"${(System.nanoTime() - t0) / 1e9}%5.2f s  rows $rows")
    }

    for (trial <- 1 to 2) {
      println(s"[knnhint] --- trial $trial ($sfDir, n=$n dim=$dim) ---")
      run("no hints")(graft.operators.AnnSearch.knnJoin(
        emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 6))
      run("hints")(graft.operators.AnnSearch.knnJoin(
        emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 6,
        rowCountHint = n, dimHint = dim))
    }
    spark.stop()
  }
}
