package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for headline queries — the
  * pushdown/pruning/broadcast audit (run: `sbt "runMain graft.tools.PlanAudit"`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("plan-audit", 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val interesting = Seq("q2_filter_project", "q3_join_agg", "q1_agg",
      "j2_simjoin_fuzzy", "q4_window_topk", "d2_jaccard_pairs",
      "d3_minhash_lsh", "a2_ann_lsh", "a3_ann_ivf", "t1_token_counts")
    interesting.foreach { name =>
      println(s"\n================ $name ================")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
