package graft.tools
object H3Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("h3-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("h3_text_knn_scale")(spark, dir)
        .collect()
      println(f"[h3] $dir ${(System.nanoTime()-t0)/1e9}%.2f s -> " +
        rows.mkString(" | "))
    }
    spark.stop()
  }
}
