package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkTestBase {

  test("exactQuantiles equals the built-in percentile bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // skewed group sizes, duplicated values (ties), a singleton group,
    // and nulls the operator must ignore
    val rows = Seq.tabulate(5000) { i =>
      val k = if (i % 97 == 0) "tiny" else s"g${i % 4}"
      val v: java.lang.Double =
        if (i % 61 == 0) null else math.floor(rnd.nextDouble() * 50) / 7.0
      (k, v)
    } :+ (("single", java.lang.Double.valueOf(3.25)))
    val df = rows.toDF("k", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)

    val got = Quantiles.exactQuantiles(df, Seq("k"), "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val aggs = ps.map(p => expr(s"percentile(v, $p)").as(s"p$p"))
    val expected = df.groupBy("k")
      .agg(aggs.head, aggs.tail: _*)
      .collect().flatMap(r =>
        ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> r.getDouble(1 + i) })
      .toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (kp, q) =>
      assert(q == expected(kp), s"quantile mismatch at $kp: $q vs ${expected(kp)}")
    }
    // n counts only non-null values
    val ns = Quantiles.exactQuantiles(df, Seq("k"), "v", Seq(0.5))
      .select("k", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nExpected = df.where($"v".isNotNull).groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ns == nExpected)
  }

  test("multi-column keys and all-null groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1, 1.0), ("a", 1, 2.0), ("a", 1, 4.0),
      ("a", 2, 10.0), ("b", 1, 7.0)
    ).toDF("k1", "k2", "v")
      .unionByName(Seq(("z", 9, Option.empty[Double])).toDF("k1", "k2", "v"))
    val out = Quantiles.exactQuantiles(df, Seq("k1", "k2"), "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out == Map(("a", 1) -> 2.0, ("a", 2) -> 10.0, ("b", 1) -> 7.0))
  }
}
