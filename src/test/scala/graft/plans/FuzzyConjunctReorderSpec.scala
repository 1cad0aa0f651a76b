package graft.plans

import graft.SparkTestBase
import graft.functions.{token_set_ratio, wratio}
import org.apache.spark.sql.functions._

class FuzzyConjunctReorderSpec extends SparkTestBase {

  private lazy val pairs = {
    val s = spark
    import s.implicits._
    Seq(("police officer", "police officer"), ("abc", "zzz zz"),
      ("data analyst", "data analyst ii")).toDF("a", "b")
  }

  test("expensive scorer moves after cheap conjuncts in the optimized plan") {
    // parquet-backed (a local Seq would be folded into a LocalRelation
    // at optimize time, hiding the Filter)
    val part = graft.queries.Tables.t(spark, sf(), "part")
      .select(col("p_name").as("a"), col("p_brand").as("b"))
    // author writes the expensive WRatio first, cheap length check last
    val df = part.where(
      wratio(col("a"), col("b")) >= 85.0 &&
        token_set_ratio(col("a"), col("b")) >= 85.0 &&
        length(col("a")) > 3)
    val optimized = df.queryExecution.optimizedPlan.toString()
    val wr = optimized.indexOf("wratio")
    val tsr = optimized.indexOf("token_set_ratio")
    val len = optimized.indexOf("length")
    assert(len >= 0 && tsr >= 0 && wr >= 0)
    assert(len < tsr && tsr < wr,
      s"expected length < token_set_ratio < wratio order in:\n$optimized")
  }

  test("reordering preserves results") {
    val reordered = pairs.where(
      wratio(col("a"), col("b")) >= 80.0 && length(col("a")) > 3)
      .collect().map(_.getString(0)).toSet
    val expected = pairs.collect()
      .filter(r => r.getString(0).length > 3 &&
        graft.functions.FuzzyKernel.wratio(r.getString(0), r.getString(1)) >= 80.0)
      .map(_.getString(0)).toSet
    assert(reordered == expected)
  }

  test("rule is active in the session extensions") {
    assert(spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .contains(FuzzyConjunctReorder) ||
      spark.sessionState.optimizer.preCBORules.contains(FuzzyConjunctReorder) ||
      spark.sessionState.optimizer.batches.exists(_.rules.contains(FuzzyConjunctReorder)))
  }
}
