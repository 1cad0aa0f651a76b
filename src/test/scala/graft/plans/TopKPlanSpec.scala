package graft.plans

import graft.SparkTestBase

/** The candidate-ranking contract, pinned at the PLAN level: every gate
  * query that ranks scored candidates per key must rank through the
  * bounded [[graft.functions.TopKByKey]] aggregate (map-side partial →
  * output-sized exchange), never the `row_number` window (candidate-sized
  * exchange). [[graft.operators.AnnSearch.rankedTopK]] falls back to the
  * window for (score, id) types outside the aggregate's support — that
  * fallback now WARNS, and this spec makes sure no gate query silently
  * regresses onto it (the r7 verdict's "correct but quiet" finding).
  */
class TopKPlanSpec extends SparkTestBase {

  /** Gate queries whose ranking stage is per-key candidate top-k.
    * (h1's windows run over ≤ k pre-topped rows and q4/q16 ARE the window
    * operators — windows there are the semantics, not a regression.) */
  private val rankingQueries = Seq("a1_ann_bruteforce", "a2_ann_lsh",
    "a3_ann_ivf", "a6_incr_ivf", "a8_ann_quantized", "a9_ann_pq",
    "a10_ann_ivfpq", "t10_bm25_batch")

  test("every candidate-ranking gate query plans the TopKByKey aggregate, not a window") {
    rankingQueries.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf())
      val analyzed = df.queryExecution.analyzed.toString
      assert(analyzed.contains("top_k_by_key"),
        s"$name: expected the top_k_by_key aggregate in the analyzed plan")
      assert(!analyzed.contains("row_number"),
        s"$name: candidate ranking fell back to the row_number window — " +
          "either the (score, id) types drifted outside TopKByKey support " +
          "or a new ranking stage bypassed rankedTopK")
    }
  }

  test("BM25 index consumers push the term set into the postings scan") {
    // the r9 persisted-index contract (VERDICT r8 task 5): h1's lexical
    // leg, t10's batch, and t11 all serve from the stored postings with
    // the driver-known term set a PUSHED parquet predicate — if the
    // filter ever degrades to a post-scan join/filter only, the scan
    // reads the whole vocabulary and the stored-index advantage is
    // gone. PLANS.md documents the shape; this pins it.
    Seq("h1_hybrid_rrf", "t10_bm25_batch", "t11_bm25_index",
        "s5_stream_index").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf())
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(term"),
        s"$name: no pushed In(term, ...) predicate on the postings scan")
    }
  }
}
