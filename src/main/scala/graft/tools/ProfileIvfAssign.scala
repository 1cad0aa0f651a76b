package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.VectorFunctions
import graft.operators.AnnSearch

/** In-JVM A/B of the IVF assignment shapes at [nDocs] (default 1M) — the
  * codegen'd NearestCentroid narrow map vs the r5 broadcast-join +
  * argmax-window shape — interleaved rounds so box co-tenancy hits both
  * arms equally. `sbt -J-Xmx10g "runMain graft.tools.ProfileIvfAssign"`. */
object ProfileIvfAssign {

  /** The r5 shape, verbatim (also the NearestCentroidSpec oracle). */
  private def windowAssign(c: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val assignedIds = c.crossJoin(broadcast(cents))
      .select(col("neighbor_id"), col("list_id"),
        VectorFunctions.cosine(col("cv"), col("centv")).as("__sim"))
      .withColumn("__rn", row_number().over(wAssign))
      .where(col("__rn") === 1)
      .select(col("neighbor_id"), col("list_id"))
    c.join(assignedIds, "neighbor_id")
      .select(col("neighbor_id"), col("cv"), col("list_id"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = SyntheticScale.embeddings(spark, n.toLong)
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val cents = AnnSearch.ivfCentroids(
      c, nlist = 64, refine = false) // fixed centroids: isolate assignment
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.groupBy(col("list_id")).count().count() // force full eval
      println(f"[ab] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (lists=$rows)")
    }
    for (round <- 1 to 3) {
      println(s"[ab] round $round")
      time("window(r5)")(windowAssign(c, cents))
      time("kernel(r6)")(AnnSearch.ivfAssign(c, cents))
    }

    // probe-selection A/B at batch-inference query counts: |Q| = n/10
    // queries picking nprobe of 64 lists — the old shape shuffled
    // |Q|×nlist rows through a per-query row_number window
    val q0 = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def windowProbes(): DataFrame = {
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("__sim").desc, col("list_id").asc)
      broadcast(q0).crossJoin(broadcast(cents))
        .withColumn("__sim", VectorFunctions.cosine(col("qv"), col("centv")))
        .withColumn("__rn", row_number().over(wProbe))
        .where(col("__rn") <= 8)
        .select(col("query_id"), col("list_id"))
    }
    def timeP(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"[ab] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$rows)")
    }
    for (round <- 1 to 3) {
      println(s"[ab] probes round $round (|Q|=${n / 10})")
      timeP("probes:window(r5)")(windowProbes())
      timeP("probes:kernel(r6)")(
        AnnSearch.probeLists(q0, cents, nprobe = 8)
          .select(col("query_id"), col("list_id")))
    }
    spark.stop()
  }
}
