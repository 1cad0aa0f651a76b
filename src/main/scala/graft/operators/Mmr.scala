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
  * upstream ANN top-N), so the whole greedy fits one row's state:
  * the default path is ONE aggregation (collect the ≤N candidate
  * structs per query — map-side combined, bounded buffer) followed by
  * a per-row kernel — one shuffle total, no per-round joins. The
  * kernel replicates the relational arithmetic BIT-FOR-BIT
  * ([[VectorFunctions.dot]]'s sequential fold, Spark `round`'s
  * HALF_UP BigDecimal) — MmrSpec pins kernel ≡ relational on
  * randomized inputs, and the a17/h6 oracles pin both against DuckDB.
  * Non-integral id types take the k-round relational path (one
  * co-keyed join + window argmax per round — correct, just k× the
  * scheduling). k and N are small constants (k ≤ 64 enforced); corpus
  * size only enters through the upstream ANN. */
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
    // null rel drops alongside null vectors — a candidate with no
    // score can never be a defensible pick, and the two paths must
    // agree on it (the kernel would otherwise NPE where the relational
    // path null-sorts)
    val base = cands.select(col(queryCol).as("q"), col(idCol).as("cid"),
        col(relCol).cast("double").as("rel"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .where(col("v").isNotNull && size(col("v")) > 0 &&
        col("rel").isNotNull)
    val integralId = cands.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val out =
      if (integralId) kernelPath(base, k, lambda)
      else relationalPath(base, k, lambda)
    // the kernel widens int ids to long for its state — restore the
    // caller's id dtype on the way out
    out.select(col("q").as(queryCol),
      col("cid").cast(cands.schema(idCol).dataType).as(idCol),
      col("mmr_rank"), col("mmr_score"))
  }

  /** One pick of the greedy step. */
  final case class MmrPick(cid: Long, mmr_rank: Int, mmr_score: Double)

  /** The per-query greedy over the collected candidate array — plain
    * Scala, but ARITHMETIC-IDENTICAL to the relational path: dot is
    * [[graft.functions.VectorKernel]]'s sequential double fold, round
    * is Spark `Round`'s HALF_UP BigDecimal. Bounded: |cands| ≤ the
    * upstream top-N. */
  private[operators] def greedy(cands: Array[(Long, Double, Array[Double])],
      k: Int, lambda: Double): Seq[MmrPick] = {
    val invl = 1.0 - lambda
    // NaN/Infinite pass through, matching Spark Round's semantics (its
    // double branch returns non-finite inputs unchanged) — BigDecimal
    // would throw NumberFormatException, diverging the two documented-
    // identical paths when a caller feeds a NaN relevance or vector
    def round9(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def dot(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
    }
    val picks = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[Array[Double]]
    val taken = scala.collection.mutable.Set.empty[Long]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      var bestCid = 0L; var bestMmr = 0.0; var bestV: Array[Double] = null
      var found = false
      cands.foreach { case (cid, rel, v) =>
        if (!taken(cid)) {
          val maxsim =
            if (selected.isEmpty) 0.0
            else selected.map(cos(v, _)).max
          val mmr = round9(lambda * rel - invl * maxsim)
          if (!found || mmr > bestMmr ||
              (mmr == bestMmr && cid < bestCid)) {
            found = true; bestCid = cid; bestMmr = mmr; bestV = v
          }
        }
      }
      // `found` is the loop condition, NOT a count comparison:
      // duplicate (query, id) candidate rows would otherwise keep the
      // loop alive past the distinct-id supply and emit fabricated
      // (cid 0, score 0) picks
      if (!found) exhausted = true
      else {
        picks += MmrPick(bestCid, rank, bestMmr)
        selected += bestV
        taken += bestCid
        rank += 1
      }
    }
    picks.toSeq
  }

  /** Default path: one aggregation, then the greedy per row. */
  private def kernelPath(base: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    val kernel = udf((cs: Seq[org.apache.spark.sql.Row]) =>
      greedy(cs.map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toArray)).toArray, k, lambda))
    base.groupBy("q")
      .agg(collect_list(struct(col("cid").cast("long").as("cid"),
        col("rel"), col("v"))).as("cs"))
      .select(col("q"), explode(kernel(col("cs"))).as("p"))
      .select(col("q"), col("p.cid").as("cid"),
        col("p.mmr_rank").as("mmr_rank"),
        col("p.mmr_score").as("mmr_score"))
  }

  /** General-dtype fallback: k rounds of co-keyed join + per-query
    * window argmax (also the independent cross-check MmrSpec holds the
    * kernel against). */
  private[operators] def relationalPath(base0: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    val base = graft.ManagedCache.swap("Mmr.base", base0)
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
    selected
  }
}
