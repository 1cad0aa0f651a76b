package graft.tools

// scratch A/B harness: run a comma-separated query subset N times in one
// session (Bench-style: suite order, noop sink), print per-run and median.
//   sbt "runMain graft.tools.MiniBench d2_jaccard_pairs,d6_char_jaccard,q9_bronze_audit 3"
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse("d2_jaccard_pairs,d6_char_jaccard,q9_bronze_audit").split(',')
    val runs = args.drop(1).headOption.fold(3)(_.toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("mini-bench", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("q1_agg") // warm the session
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val all = (1 to runs).map { r =>
      System.gc()
      val (gc0, t0) = (gcMillis, System.nanoTime())
      val m = names.map(n => n -> time(n)).toMap
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage
      import scala.jdk.CollectionConverters._
      val codeCache = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(_.getName.contains("CodeHeap"))
        .map(p => s"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=" +
          s"${p.getUsage.getUsed / (1 << 20)}/${p.getUsage.getMax / (1 << 20)}MB")
        .mkString(" ")
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime / 1000.0
      println(f"[mini] pass $r: wall ${(System.nanoTime() - t0) / 1e9}%5.2f s, " +
        f"gc-in-pass ${(gcMillis - gc0) / 1000.0}%5.2f s, " +
        f"heap-used ${heap.getUsed / (1 << 20)}%d MB, " +
        f"jit-total $jit%6.1f s, " +
        s"threads ${java.lang.management.ManagementFactory.getThreadMXBean.getThreadCount}, " +
        s"slots ${graft.ManagedCache.size}, codeheap $codeCache")
      m
    }
    names.foreach { n =>
      val ts = all.map(_(n)).sorted
      println(f"[mini] $n%-22s median ${ts(ts.length / 2)}%6.2f s  runs ${ts.map(t => f"$t%5.2f").mkString(" ")}")
    }
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.keySet.asScala.toSeq
      .groupBy(_.getName.replaceAll("[0-9]+", "#")).view.mapValues(_.size)
      .toSeq.sortBy(-_._2).take(12)
      .foreach { case (n, c) => println(f"[mini-threads] $c%4d  $n") }
    spark.stop()
  }
}
