package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.AnnSearch

/** [[TopKByKey]] (via AnnSearch.rankedTopK) must be ROW-IDENTICAL to the
  * `row_number over (partition by key order by score desc, id asc) <= k`
  * window it replaces — including the awkward corners: NaN scores (rank
  * greatest under Spark's DESC double ordering), null scores (NULLS
  * LAST), ties broken by id, groups smaller than k, and string ids
  * (UTF8String binary order + buffer copy-out of unsafe-row views). */
class TopKByKeySpec extends SparkTestBase {

  // NaN-proof cell: Scala `==` unboxes Doubles, so tuple equality would
  // treat two NaN cells as different — compare on the string form instead
  private def cell(v: Any): Any = v match {
    case d: java.lang.Double if d.isNaN => "NaN"
    case other => other
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int)
      : Set[(Any, Any, Any, Int)] = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .collect().map(r => (r.get(0), r.get(1), cell(r.get(2)), r.getInt(3))).toSet
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int)
      : Set[(Any, Any, Any, Int)] =
    AnnSearch.rankedTopK(df, "key", "id", "score", k)
      .collect().map(r => (r.get(0), r.get(1), cell(r.get(2)), r.getInt(3))).toSet

  test("randomized parity with the window formulation (double score, long id)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { _ =>
      val key = rnd.nextInt(40).toLong
      val id = rnd.nextInt(300).toLong
      // deliberate tie mass + NaN + null scores
      val score: java.lang.Double = rnd.nextInt(10) match {
        case 0 => Double.NaN
        case 1 => null
        case n => (n % 4).toDouble / 2.0
      }
      (key, id, score)
    }.distinct // duplicate (key, id, score) rows would tie ambiguously
    val df = rows.toDF("key", "id", "score").repartition(7)
    for (k <- Seq(1, 3, 17, 1000))
      assert(aggTopK(df, k) == windowTopK(df, k), s"k=$k diverged")
  }

  test("parity with string ids and long scores") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(20), s"id_${rnd.nextInt(100)}%03d", rnd.nextInt(5).toLong)
    }.distinct
    val df = rows.toDF("key", "id", "score").repartition(5)
    for (k <- Seq(1, 4, 50))
      assert(aggTopK(df, k) == windowTopK(df, k), s"k=$k diverged")
  }

  test("parity with timestamp scores (latest-n per key as a bounded aggregate)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(500).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }.distinct
    val df = rows.toDF("key", "id", "score").repartition(5)
    // the aggregate (not the window) must carry this shape...
    assert(AnnSearch.rankedTopK(df, "key", "id", "score", 3)
      .queryExecution.analyzed.toString.contains("top_k_by_key"))
    for (k <- Seq(1, 3, 40))
      assert(aggTopK(df, k) == windowTopK(df, k), s"k=$k diverged")
  }

  test("parity with decimal scores across the serialize/merge path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(400).toLong,
        BigDecimal(rnd.nextInt(100000)) / 100)
    }.distinct
    val df = rows.toDF("key", "id", "score").repartition(7)
    assert(AnnSearch.rankedTopK(df, "key", "id", "score", 3)
      .queryExecution.analyzed.toString.contains("top_k_by_key"))
    for (k <- Seq(2, 25))
      assert(aggTopK(df, k) == windowTopK(df, k), s"k=$k diverged")
  }

  test("map-side partial aggregation bounds the exchange (plan shape)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i % 5L, i.toLong, i.toDouble))
      .toDF("key", "id", "score")
    val plan = AnnSearch.rankedTopK(df, "key", "id", "score", 3)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial -> exchange -> final: the partial
    // aggregate BELOW the shuffle is what caps the exchange at k per
    // (task, key)
    assert(plan.contains("ObjectHashAggregate"), plan)
    val aggAt = plan.indexOf("ObjectHashAggregate")
    assert(plan.indexOf("Exchange", aggAt) >= 0 ||
      plan.lastIndexOf("ObjectHashAggregate") > aggAt, plan)
  }
}
