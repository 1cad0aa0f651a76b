package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Timing forces full materialization through the `noop` sink — `count()`
  * would let Catalyst prune the projected columns and undercount the real
  * work. A warmup query amortizes JVM/codegen startup out of the numbers.
  *
  * Each query is timed over SPARK_GRAFT_BENCH_RUNS rounds (default 3) and
  * reported as the per-query MEDIAN: a single-run suite showed ±25-30%
  * run-to-run swings on codegen-heavy queries (JIT/GC state carried
  * between queries), which is wider than most real regressions. Rounds
  * alternate whole-suite passes (run 1 of every query, then run 2, …) so
  * every query's first timing is equally "cold in, shared machinery warm"
  * — the shape the per-round driver bench measures.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = (1 to runs).map(_ => names.map(n => n -> runOnce(n)).toMap)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = names.map { n =>
      val ok = samples.map(_(n)).filter(_ >= 0)
      // any failed round marks the query failed — a flaky query must not
      // quietly report the median of its surviving rounds
      n -> (if (ok.size < runs) -1.0 else median(ok))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // a failed query must not read as a speedup: surface the count
    // explicitly next to the successful-query total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
