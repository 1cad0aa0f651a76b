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

  test("sampleTopByBudget: takes docs in weight-desc order until the budget fills") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val df = (0L until 200L).map(i =>
      (i, s"l${i % 2}", 10L + rng.nextInt(30), rng.nextDouble() * 10 - 5))
      .toDF("doc_id", "lang", "n_tokens", "w")
    val budgets = Map("l0" -> 300L, "l1" -> 500L)
    val kept = Splits.sampleTopByBudget(df, "doc_id", "lang", "n_tokens",
        "w", budgets)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    // single-window reference: weight desc, id tie-break, exclusive sum
    val want = df.withColumn("cb",
        coalesce(sum(col("n_tokens")).over(Window.partitionBy(col("lang"))
          .orderBy(col("w").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect()
      .filter(r => budgets.get(r.getString(1)).exists(r.getLong(4) < _))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(kept.map(_._1).sorted.toSeq == want.map(_._1).sorted.toSeq)

    // the kept set is exactly the top-weighted prefix: every kept doc's
    // weight >= every dropped doc's weight within its stratum (modulo
    // the id tie-break at the boundary)
    budgets.keys.foreach { lang =>
      val keptW = kept.filter(_._2 == lang).map(_._4)
      val dropped = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
        .filter(t => t._2 == lang && !kept.exists(_._1 == t._1)).map(_._3)
      assert(dropped.forall(dw => keptW.forall(_ >= dw)),
        s"$lang kept a lower-weighted doc over a higher-weighted one")
    }
  }

  test("sampleTopByBudget: deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val df = (0L until 150L).map(i => (i, "x", 7L + i % 11,
      (i * 37 % 50).toDouble))
      .toDF("doc_id", "lang", "n_tokens", "w")
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      Splits.sampleTopByBudget(d, "doc_id", "lang", "n_tokens", "w",
        Map("x" -> 400L)).collect().map(_.getLong(0)).toSet
    assert(ids(df) == ids(df.repartition(9, col("doc_id"))))
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
