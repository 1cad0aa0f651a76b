package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {

  import Expectations._

  private def reportMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, Boolean)] =
    df.collect().map(r => r.getString(1) ->
      ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("row checks: planted nulls, out-of-range values and bad enum " +
      "members produce exact violation counts; NULL predicate = violation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(2L), Some(-5.0), Some("F")),   // range violation
      (None,     Some(3.0),  Some("X")),   // null id + bad status
      (Some(4L), None,       Some("O")),   // NULL range predicate = violation
      (Some(5L), Some(2.0),  None))        // NULL isin = violation
      .toDF("id", "price", "status")
    val got = reportMap(report(df, "t", Seq(
      Check("id_not_null", col("id").isNotNull),
      Check("price_positive", col("price") > 0.0),
      Check("status_accepted", col("status").isin("O", "F")))))
    assert(got("id_not_null") == ((5L, 1L, false)))
    assert(got("price_positive") == ((5L, 2L, false)))
    assert(got("status_accepted") == ((5L, 2L, false)))
  }

  test("unique key: duplicate rows count in excess of distinct; NULL " +
      "keys are not duplicates of each other") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val got = reportMap(report(df, "t", Nil,
      Seq(UniqueKey("k_unique", col("k")))))
    // 4 non-null rows over 2 distinct keys -> 2 excess rows
    assert(got("k_unique") == ((6L, 2L, false)))
  }

  test("a clean table passes every check") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    val got = reportMap(report(df, "t",
      Seq(Check("v_pos", col("v") > 0.0)),
      Seq(UniqueKey("id_unique", col("id")))))
    assert(got.values.forall { case (n, v, p) => n == 2L && v == 0L && p })
  }

  test("all row checks over a table fold in ONE scan (single leaf in " +
      "the optimized plan)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2.0), (3L, 4.0)).toDF("id", "v")
    val plan = report(df, "t", Seq(
      Check("a", col("id").isNotNull), Check("b", col("v") > 0.0),
      Check("c", col("v") < 100.0)),
      Seq(UniqueKey("u", col("id")))).queryExecution.optimizedPlan
    assert(plan.collectLeaves().size == 1,
      s"expected one scan, got:\n$plan")
  }

  test("fkReport: orphan child ROWS count (a repeated orphan key counts " +
      "each row); NULL child keys are not orphans") {
    val s = spark
    import s.implicits._
    val child = Seq(Some(1L), Some(9L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = fkReport(child, "ck", parent, "pk", "child", "ck_fk")
      .collect().head
    assert(r.getString(0) == "child" && r.getString(1) == "ck_fk")
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L && !r.getBoolean(4))
  }

  test("guards: no expectations is an error; duplicate check names are") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      report(Seq(1).toDF("x"), "t", Nil, Nil)
    }
    intercept[IllegalArgumentException] {
      report(Seq(1).toDF("x"), "t",
        Seq(Check("a", col("x") > 0), Check("a", col("x") < 9)))
    }
    // a dotted name would splice into col("__v_a.b") and parse as a
    // struct-field access — rejected up front with a clear message
    val e = intercept[IllegalArgumentException] {
      report(Seq(1).toDF("x"), "t", Seq(Check("a.b", col("x") > 0)))
    }
    assert(e.getMessage.contains("A-Za-z0-9_"))
    intercept[IllegalArgumentException] {
      report(Seq(1).toDF("x"), "t", Nil,
        Seq(UniqueKey("k`q", col("x"))))
    }
  }
}
