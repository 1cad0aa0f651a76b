package graft.operators

import graft.SparkTestBase

class EvalSpec extends SparkTestBase {

  private def df(rows: Seq[(String, Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("q", "item", "rank")
  }

  test("hand-computed recall: partial hits, lost queries, rank cutoff") {
    val exact = df(Seq(
      ("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),
      ("B", 7L, 1), ("B", 8L, 2),
      ("C", 9L, 1)))
    val approx = df(Seq(
      ("A", 2L, 1), ("A", 9L, 2), ("A", 3L, 4),   // rank 4 > k: ignored
      ("B", 7L, 1), ("B", 8L, 2)))                 // perfect
    // C absent from approx entirely -> recall 0, NOT dropped
    val got = Eval.recallAtK(approx, exact, "q", "item", "rank", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "A" -> ((3L, 1L, 0.333333)),
      "B" -> ((2L, 2L, 1.0)),
      "C" -> ((1L, 0L, 0.0))))
  }

  test("recall is against what exact returned, not k") {
    val exact = df(Seq(("A", 1L, 1)))              // n_exact = 1 < k
    val approx = df(Seq(("A", 1L, 1), ("A", 2L, 2)))
    val got = Eval.recallAtK(approx, exact, "q", "item", "rank", k = 5)
      .collect()
    assert(got.length == 1 && got.head.getDouble(3) == 1.0)
  }

  test("mrrAtK: hand-computed first ranks, lost query, duplicate keeps best") {
    val exact = df(Seq(
      ("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),   // relevance = top-2
      ("B", 7L, 1), ("B", 8L, 2),
      ("C", 9L, 1)))
    val approx = df(Seq(
      ("A", 5L, 1), ("A", 2L, 3), ("A", 2L, 4),   // dup (A,2): best rank 3
      ("B", 8L, 2), ("B", 7L, 5),                  // first relevant at 2
      ("C", 1L, 1)))                               // no relevant hit
    val got = Eval.mrrAtK(approx, exact, "q", "item", "rank",
        k = 5, relK = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == Map(
      "A" -> ((2L, 3L, 0.333333, 1L)),
      "B" -> ((2L, 2L, 0.5, 1L)),
      "C" -> ((1L, -1L, 0.0, 0L))))
  }

  test("mrrAtK: rank cutoff — a relevant item beyond k does not count") {
    val exact = df(Seq(("A", 1L, 1)))
    val approx = df(Seq(("A", 2L, 1), ("A", 1L, 4)))
    val got = Eval.mrrAtK(approx, exact, "q", "item", "rank",
        k = 3, relK = 1).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == -1L && got.head.getLong(4) == 0L)
  }

  test("ndcgAtK: perfect order scores 1, right set in reverse order less") {
    val exact = df(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3)))
    val perfect = df(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3)))
    val reversed = df(Seq(("A", 3L, 1), ("A", 2L, 2), ("A", 1L, 3)))
    def ndcg(a: org.apache.spark.sql.DataFrame): Double =
      Eval.ndcgAtK(a, exact, "q", "item", "rank", k = 3)
        .select("ndcg").head().getDouble(0)
    assert(ndcg(perfect) == 1.0)
    val rev = ndcg(reversed)
    // recall@3 of the reversed list is 1.0 — nDCG is the metric that
    // sees the order: hand value (1/log2(2)+2/log2(3)+3/log2(4)) /
    // (3/log2(2)+2/log2(3)+1/log2(4)) = 3.76186/4.76186 ≈ 0.789998
    assert(rev < 1.0 && math.abs(rev - 0.789998) < 1e-6)
  }

  test("ndcgAtK: lost query scores 0, not dropped") {
    val exact = df(Seq(("A", 1L, 1), ("B", 2L, 1)))
    val approx = df(Seq(("A", 1L, 1)))
    val got = Eval.ndcgAtK(approx, exact, "q", "item", "rank", k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == Map("A" -> 1.0, "B" -> 0.0))
  }

  test("classReport: hand-computed per-class metrics, no class dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "a"), ("a", "b"),           // a: 2 true, 1 correct
      ("b", "b"), ("b", "b"),           // b: 2 true, 3 predicted, 2 ok
      ("c", "d"))                        // c never predicted; d never true
      .toDF("label", "pred")
    val got = Eval.classReport(df, "label", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set("a", "b", "c", "d"))
    assert(got("a") == ((2L, 1L, 1L, 1.0, 0.5, 0.666667)))
    assert(got("b") == ((2L, 3L, 2L, 0.666667, 1.0, 0.8)))
    assert(got("c") == ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(got("d") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("classReport: null labels/preds drop") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "a"), (null, "a"), ("a", null))
      .toDF("label", "pred")
    val got = Eval.classReport(df, "label", "pred").collect()
    assert(got.length == 1 && got.head.getString(0) == "a" &&
      got.head.getLong(1) == 1L && got.head.getLong(2) == 1L)
  }

  test("duplicate (q, item) rows within rank<=k never inflate recall") {
    // the same hit listed twice in approx, and the same exact row
    // twice: without the distinct both counts multiply through the
    // join and recall can exceed 1.0
    val exact = df(Seq(("A", 1L, 1), ("A", 1L, 2), ("A", 2L, 3)))
    val approx = df(Seq(("A", 1L, 1), ("A", 1L, 2)))
    val got = Eval.recallAtK(approx, exact, "q", "item", "rank", k = 3)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getDouble(3) == 0.5)
  }

  test("k guard") {
    val d = df(Seq(("A", 1L, 1)))
    intercept[IllegalArgumentException](
      Eval.recallAtK(d, d, "q", "item", "rank", k = 0))
  }
}
