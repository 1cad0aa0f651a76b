package graft.tools

/** Replays the driver's t1 smoke: SparkEntry.entry at sf0.001, rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("entry-smoke", 4)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    assert(n > 0, "entry() must return rows at sf0.001")
    spark.stop()
  }
}
