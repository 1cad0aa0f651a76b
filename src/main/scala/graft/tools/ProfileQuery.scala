package graft.tools

import org.apache.spark.sql.DataFrame

/** Scratch profiler: run any SparkEntry query by name with per-stage
  * wall times. `sbt "runMain graft.tools.ProfileQuery d5_cosine_neardup
  * [sfdir]"`. Not part of the driver contract. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d5_cosine_neardup")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("profile-query", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // warmup the session machinery the way Bench does
    run("warmup q1_agg")(graft.SparkEntry.queries("q1_agg")(spark, sfDir))

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId,
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    run(s"$name (cold)")(graft.SparkEntry.queries(name)(spark, sfDir))
    Thread.sleep(300)
    spark.sparkContext.removeSparkListener(listener)
    stages.entrySet().stream().sorted(
      java.util.Comparator.comparingInt[java.util.Map.Entry[Int, (Long, Int)]](_.getKey))
      .forEach(e => println(
        f"[stage] ${e.getKey}%4d ${e.getValue._1}%6d ms ${e.getValue._2}%4d tasks"))
    run(s"$name (warm)")(graft.SparkEntry.queries(name)(spark, sfDir))
    if (sys.env.contains("GRAFT_PRINT_PLAN")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
