package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) — the DIVERSITY pass retrieval pipelines run over a
  * top-N candidate list so near-duplicate hits don't crowd the final
  * k (RAG context assembly, hard-negative pools, eval suites).
  *
  * Greedy, with every source of nondeterminism pinned (the a16/x4
  * replayability discipline): pick i maximizes
  * `round(λ·rel − (1−λ)·maxSim(picked), 9)` with a candidate-id
  * tie-break, where maxSim is the max cosine (the a1 convention —
  * [[VectorFunctions.cosine]] == DuckDB's `list_cosine_similarity`)
  * to the already-picked set, 0 for the empty set — so pick 1 is the
  * plain relevance argmax and the whole trajectory unrolls into SQL.
  *
  * Scale shape: candidates arrive ALREADY BOUNDED per query (the
  * upstream ANN top-N); each of the k rounds is one co-keyed join on
  * the query column plus one per-query window argmax — state never
  * exceeds the candidate set, nothing is per-query collected, and all
  * k rounds share the query-hash partitioning (one exchange family).
  * k and N are small constants (k ≤ 64 enforced); corpus size only
  * enters through the upstream ANN. */
object Mmr {

  /** Re-rank per-query candidates → (query, id, mmr_rank 1..k,
    * mmr_score). `relCol` is the relevance score (higher = better),
    * `vecCol` the candidate's embedding for the redundancy term.
    * Queries with fewer than k candidates emit what they have. */
  def rerank(cands: DataFrame, queryCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"lambda must be in (0, 1]: $lambda")
    val base = graft.ManagedCache.swap("Mmr.base",
      cands.select(col(queryCol).as("q"), col(idCol).as("cid"),
          col(relCol).cast("double").as("rel"),
          transform(col(vecCol), x => x.cast("double")).as("v"))
        .where(col("v").isNotNull && size(col("v")) > 0))
    val w = Window.partitionBy("q").orderBy(col("mmr").desc, col("cid"))
    var selected: DataFrame = null
    for (i <- 1 to k) {
      val rem =
        if (selected == null) base
        else base.join(selected.select(col("q"), col("cid")),
          Seq("q", "cid"), "left_anti")
      val withSim =
        if (selected == null) rem.withColumn("maxsim", lit(0.0))
        else {
          val sims = rem.select(col("q"), col("cid"), col("v"))
            .join(selected.select(col("q"), col("v").as("sv")), "q")
            .groupBy("q", "cid")
            .agg(max(VectorFunctions.cosine(col("v"), col("sv")))
              .as("maxsim"))
          rem.join(sims, Seq("q", "cid"))
        }
      val pick = withSim
        .withColumn("mmr", round(lit(lambda) * col("rel") -
          lit(1.0 - lambda) * col("maxsim"), 9))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("q"), col("cid"), col("v"),
          lit(i).as("mmr_rank"), col("mmr").as("mmr_score"))
      // eager localCheckpoint: truncates the per-round lineage (the
      // KMeans/Components discipline) so round i+1 doesn't recompute
      // rounds 1..i
      selected =
        (if (selected == null) pick else selected.unionByName(pick))
          .localCheckpoint(true)
    }
    selected.select(col("q").as(queryCol), col("cid").as(idCol),
      col("mmr_rank"), col("mmr_score"))
  }
}
