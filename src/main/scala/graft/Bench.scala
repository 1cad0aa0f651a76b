package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Timing forces full materialization through the `noop` sink — `count()`
  * would let Catalyst prune the projected columns and undercount the real
  * work. A warmup query amortizes JVM/codegen startup out of the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // one session recipe for bench/verify/tools/tests (Sessions.local):
    // extensions (SQL functions + FuzzyConjunctReorder), AQE, broadcast
    // threshold — the benchmarked engine IS the shipped engine
    val spark = graft.Sessions.local("graft-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)

    def runOnce(name: String): Double = {
      System.gc() // isolate queries from each other's garbage
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: parquet reader + codegen + shuffle machinery
    runOnce("q1_agg")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // a failed query must not read as a speedup: surface the count
    // explicitly next to the successful-query total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
