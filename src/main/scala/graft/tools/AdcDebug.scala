package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.AnnSearch

/** One-off: cached vs exchanged PQ-code input, same ADC scoring. */
object AdcDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("adc-debug", 16)
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val emb = SyntheticScale.embeddings(spark, n)
    val q = emb.where(col("vec_id") % (n / 50) === 0)
    println(s"corpus=$n queries=${q.count()}")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
    val sub = AnnSearch.pqSubDim(c, 8)
    val cms = AnnSearch.pqCodebooks(c, 8, 32, sub)
    val c8u = c.select(col("neighbor_id"),
      AnnSearch.pqEncode(col("cv"), cms, sub).as("codes"))
    val q0 = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val qx = q0.withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), cms, sub))
      .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
    val score = AnnSearch.pqAdcCosine(col("__lut"), col("__qn"),
      col("codes"), cms)

    def run(c8: DataFrame, name: String): String = {
      val df = broadcast(qx).crossJoin(c8)
        .where(col("query_id") =!= col("neighbor_id"))
        .select(score.as("s")).agg(sum(col("s")))
      timed(name)(println("  agg=" + df.head().get(0)))
      df.queryExecution.executedPlan.toString
    }
    val cached = c8u.cache(); cached.count()
    val pCached = run(cached, "cached c8")
    val pEx = run(graft.operators.Par.spread(c8u, col("neighbor_id")),
      "exchanged c8")
    cached.unpersist()
    println("=== cached plan ===")
    println(pCached.linesIterator.map(_.take(150)).mkString("\n"))
    println("=== exchanged plan ===")
    println(pEx.linesIterator.map(_.take(150)).mkString("\n"))
  }
}
