package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Scratch profiler for the dense all-pairs Jaccard path at sf0.1:
  * where do d2's ~4 s go? Not part of the driver contract. */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("profile-d2", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(count(lit(1))).write.format("noop").mode("overwrite").save()

    val t0 = System.nanoTime()
    val d2 = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.5)
    println(f"[profile] construction (stats jobs) ${(System.nanoTime() - t0) / 1e9}%8.2f s")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId,
          (si.name.take(60),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("execute d2")(d2)
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    stages.entrySet().stream().sorted(
      java.util.Comparator.comparingInt[java.util.Map.Entry[Int, (String, Long, Int)]](_.getKey))
      .forEach { e =>
        println(f"[stage] ${e.getKey}%4d ${e.getValue._2}%6d ms ${e.getValue._3}%4d tasks  ${e.getValue._1}")
      }
    time("execute d2 again (cached)")(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.5))
    spark.stop()
  }
}
