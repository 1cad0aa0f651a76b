package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BudgetSampleSpec extends SparkTestBase {

  test("cumSumBeforeBy equals the single-window reference, per stratum") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val df = (0L until 500L).map(i =>
      (i, s"lang${rng.nextInt(4)}", rng.nextInt(50).toLong))
      .toDF("id", "lang", "v")

    val got = Packing.cumSumBeforeBy(df, Seq("lang"), Seq("id"), "v",
        width = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = df.withColumn("cb",
        coalesce(sum(col("v")).over(Window.partitionBy(col("lang"))
          .orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("cumSumBeforeBy keeps null-stratum rows (null-safe offset join)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option("a"), 5L), (2L, Option.empty[String], 3L),
      (3L, Option("a"), 2L), (4L, Option.empty[String], 4L))
      .toDF("id", "lang", "v")
    val got = Packing.cumSumBeforeBy(df, Seq("lang"), Seq("id"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 5L, 4L -> 3L))
  }

  test("sampleByTokenBudget: fills each budget, overruns by at most the boundary doc") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val df = (0L until 300L).map(i =>
      (i, s"l${i % 3}", 10L + rng.nextInt(40)))
      .toDF("doc_id", "lang", "n_tokens")
    val budgets = Map("l0" -> 400L, "l1" -> 900L)
    val kept = Splits.sampleByTokenBudget(df, "doc_id", "lang", "n_tokens",
        "s1", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    assert(kept.forall(_._2 != "l2")) // unbudgeted stratum dropped
    budgets.foreach { case (lang, b) =>
      val toks = kept.filter(_._2 == lang).map(_._3)
      val total = toks.sum
      assert(total >= b, s"$lang under-filled: $total < $b")
      assert(total - toks.max < b, s"$lang kept a doc past the boundary")
    }
  }

  test("sampleByTokenBudget: deterministic under repartitioning; budgets nest") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i => (i, "x", 5L + i % 13))
      .toDF("doc_id", "lang", "n_tokens")
    def ids(d: org.apache.spark.sql.DataFrame, b: Long): Set[Long] =
      Splits.sampleByTokenBudget(d, "doc_id", "lang", "n_tokens", "s2",
        Map("x" -> b)).collect().map(_.getLong(0)).toSet
    val a = ids(df, 500L)
    assert(a == ids(df.repartition(13, col("doc_id")), 500L))
    assert(a.subsetOf(ids(df, 900L)))
  }
}
