package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Retrieval evaluation — recall@k of an approximate result set against
  * an exact baseline, as a first-class operator instead of ad-hoc gate
  * code. Every approximate family here (LSH/IVF/PQ ANN, text-kNN,
  * filtered search) carries recall contracts; this is the shared
  * machinery those contracts compute, exposed so a user can score THEIR
  * index configuration the same way the gate scores ours.
  *
  * Scale shape: both inputs are retrieval OUTPUTS (|queries|·k rows —
  * output-sized, never corpus-sized), so the (query, item) equi-join
  * and the per-query rollups are trivial at any corpus scale; the
  * expensive part is producing the inputs, which is the retrieval
  * operators' own (audited) cost. */
object Eval {

  /** Per-query recall@k → (q, n_exact, n_hit, recall). Rows with
    * rank > k in either frame are ignored; queries present in `exact`
    * but absent from `approx` score 0 (never silently dropped — an
    * approximate index that LOSES a query is the failure recall must
    * surface). recall = n_hit / n_exact rounded to 6 (n_exact can be
    * < k when the corpus is small — recall is against what exact
    * actually returned). */
  def recallAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // distinct BOTH sides: duplicate (q, i) rows within rank <= k —
    // legal in a caller's frame even though our retrievers never emit
    // them — would otherwise multiply through the count join and let
    // recall exceed 1.0 (or inflate n_exact) silently
    val a = approx.where(col(rankCol) <= k)
      .select(col(queryCol).as("q"), col(itemCol).as("i")).distinct()
    val x = exact.where(col(rankCol) <= k)
      .select(col(queryCol).as("q"), col(itemCol).as("i")).distinct()
    val nx = x.groupBy("q").agg(count(lit(1)).as("n_exact"))
    val hits = x.join(a, Seq("q", "i"))
      .groupBy("q").agg(count(lit(1)).as("n_hit"))
    nx.join(hits, Seq("q"), "left")
      .select(col("q"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact"), 6).as("recall"))
  }

  /** Per-query RECIPROCAL RANK → (q, n_rel, first_rank, rr, hit) —
    * recall@k asks "how much of the truth did the index return";
    * MRR asks "how FAR DOWN the list was the first true answer", the
    * serving-latency-facing metric (a recall-1.0 index that ranks the
    * true neighbor 5th still costs a reranker 5 candidates). Relevance
    * = `exact`'s rank ≤ `relK` items; per query, `first_rank` is the
    * best `approx` rank (≤ k) holding a relevant item, `rr` its exact
    * reciprocal (one IEEE division — portable), `hit` the hit@k
    * indicator. Queries `exact` knows but `approx` lost score 0 with
    * `first_rank` −1 (the recallAtK never-drop discipline); duplicate
    * (q, i) rows keep their best rank. Mean-MRR is one avg over the
    * output — kept per-query here so the report composes (slice by
    * query cohort, join per-query latencies, feed regressions).
    *
    * Scale shape: both inputs retrieval outputs (|queries|·k rows);
    * one equi-join + two output-sized rollups. */
  def mrrAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, k: Int, relK: Int): DataFrame = {
    require(k >= 1 && relK >= 1, s"k and relK must be >= 1: $k, $relK")
    val rel = exact.where(col(rankCol) <= relK)
      .select(col(queryCol).as("q"), col(itemCol).as("i")).distinct()
    val a = approx.where(col(rankCol) <= k)
      .select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(rankCol).cast("long").as("r"))
      .groupBy("q", "i").agg(min(col("r")).as("r"))
    val firsts = rel.join(a, Seq("q", "i"))
      .groupBy("q").agg(min(col("r")).as("first_rank"))
    val nRel = rel.groupBy("q").agg(count(lit(1)).as("n_rel"))
    nRel.join(firsts, Seq("q"), "left")
      .select(col("q"), col("n_rel"),
        coalesce(col("first_rank"), lit(-1L)).as("first_rank"),
        when(col("first_rank").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_rank"), 6)).as("rr"),
        when(col("first_rank").isNull, lit(0L)).otherwise(lit(1L))
          .as("hit"))
  }

  /** Per-query nDCG@k → (q, dcg, idcg, ndcg) — the graded completion
    * of the eval trio: recall@k counts what came back, MRR where the
    * first answer sat, nDCG how well the WHOLE returned order matches
    * the true order (a list with the right set in reverse order passes
    * recall and loses here). Graded relevance from `exact`: rank j ∈
    * [1, k] carries gain k−j+1, everything else 0; DCG sums
    * gain/log₂(rank+1) over the approx positions, IDCG over the exact
    * (= ideal) positions, both rounded to 6 alongside their ratio
    * (log₂ is libm — the k5/p3 discipline). Lost queries score 0;
    * duplicate (q, i) rows keep their best rank on either side.
    *
    * Scale shape: one output-sized equi-join + two per-query rollups,
    * like the rest of the family. */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val x = exact.where(col(rankCol) <= k)
      .select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(rankCol).cast("long").as("xr"))
      .groupBy("q", "i").agg(min(col("xr")).as("xr"))
      .withColumn("rel", (lit(k.toLong) - col("xr") + 1L).cast("double"))
    val a = approx.where(col(rankCol) <= k)
      .select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(rankCol).cast("long").as("ar"))
      .groupBy("q", "i").agg(min(col("ar")).as("ar"))
    val dcg = x.join(a, Seq("q", "i"))
      .groupBy("q")
      .agg(sum(col("rel") / log2(col("ar").cast("double") + 1.0))
        .as("dcg"))
    val idcg = x.groupBy("q")
      .agg(sum(col("rel") / log2(col("xr").cast("double") + 1.0))
        .as("idcg"))
    idcg.join(dcg, Seq("q"), "left")
      .select(col("q"),
        round(coalesce(col("dcg"), lit(0.0)), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6)
          .as("ndcg"))
  }

  /** Per-class classification report → (clazz, n_true, n_pred,
    * n_correct, precision, recall, f1) from (label, prediction) rows —
    * the eval a classifier pipeline (language-ID, quality buckets,
    * topic routing) reports per class. Classes appearing only as a
    * label OR only as a prediction still get a row (n_pred/n_true 0 →
    * the missing-side metric is 0, never a dropped class). F1 is
    * computed from the round-6 precision/recall (so the whole report
    * is a pure function of the integer counts). Null labels or
    * predictions drop.
    *
    * Scale shape: three class-cardinality aggregations over one scan
    * of (label, pred) pairs, joined on the class — output-sized
    * (|classes| rows) at any input volume. */
  def classReport(df: DataFrame, labelCol: String, predCol: String)
      : DataFrame = {
    val pairs = df.select(col(labelCol).as("label"), col(predCol).as("pred"))
      .where(col("label").isNotNull && col("pred").isNotNull)
    val t = pairs.groupBy(col("label").as("clazz"))
      .agg(count(lit(1)).as("n_true"))
    val p = pairs.groupBy(col("pred").as("clazz"))
      .agg(count(lit(1)).as("n_pred"))
    val c = pairs.where(col("label") === col("pred"))
      .groupBy(col("label").as("clazz"))
      .agg(count(lit(1)).as("n_correct"))
    val base = t.join(p, Seq("clazz"), "full")
      .join(c, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
    val withPr = base
      .withColumn("precision", when(col("n_pred") === 0, lit(0.0))
        .otherwise(round(col("n_correct").cast("double") /
          col("n_pred"), 6)))
      .withColumn("recall", when(col("n_true") === 0, lit(0.0))
        .otherwise(round(col("n_correct").cast("double") /
          col("n_true"), 6)))
    withPr.withColumn("f1",
      when(col("precision") + col("recall") === 0.0, lit(0.0))
        .otherwise(round(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall")), 6)))
  }
}
