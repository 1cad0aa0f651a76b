package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical leg
  * ([[TextSearch.bm25TopK]]) with a semantic leg ([[AnnSearch]] top-k)
  * is the standard retrieval shape for training-data curation (find
  * documents similar to a seed set by keywords AND by embedding).
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR'09): each leg
  * contributes `1/(kRrf + rank)` per document; documents missing from a
  * leg contribute nothing. RRF needs only ranks, never the legs'
  * incomparable raw scores — which also makes the fused output
  * oracle-friendly: ranks are ints, and for TWO legs the per-doc sum is
  * bit-deterministic regardless of reduction order (IEEE addition is
  * commutative; associativity only bites at ≥3 terms). With ≥3 legs the
  * fused ORDER is still stable (contribution gaps dwarf last-bit noise)
  * but the score's last bits are reduction-order artifacts.
  *
  * At scale each leg is already a top-N (≤ N rows per leg), so the
  * union + hash-aggregate here runs on `legs × N` rows — negligible
  * next to the legs themselves; the final top-k is a TakeOrdered
  * followed by a ≤ k-row rank window.
  */
object HybridSearch {

  /** Fuse ranked legs by RRF. Each leg must expose `idCol` and
    * `rankCol` (rank 1 = best). Output: idCol, rrf_score (double),
    * legs_hit (long), rank — ties broken on id ascending. */
  def rrf(legs: Seq[DataFrame], idCol: String, rankCol: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrf needs at least one leg")
    require(kRrf >= 1, "kRrf must be positive")
    val u = legs.map(_.select(col(idCol).as("id"),
        (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol).cast("double")))
          .as("contrib")))
      .reduce(_ unionAll _)
    val fused = u.groupBy("id")
      .agg(sum(col("contrib")).as("rrf_score"),
        count(lit(1)).as("legs_hit"))
    val top = fused.orderBy(col("rrf_score").desc, col("id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("id").asc)))
      .select(col("id").as(idCol), col("rrf_score"), col("legs_hit"),
        col("rank"))
  }
}
