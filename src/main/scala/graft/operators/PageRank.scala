package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Fixed-iteration PageRank (Brin & Page 1998) over an edge list — the
  * node-importance statistic behavioral/link graphs feed into ranking
  * and data-curation pipelines (alongside [[Components]], the other
  * whole-graph operator here; the reference's event stream stops at
  * windowed counts, this is the cross-ROW recursion those rows feed).
  *
  * Semantics (the classic simplified formulation, chosen because every
  * step is engine-portable relational algebra):
  *   pr₀(v) = 1/N;
  *   prₜ₊₁(v) = (1−d)/N + d · Σ_{u→v} prₜ(u)/outdeg(u)
  * over the DISTINCT edge set, for a FIXED iteration count — no
  * convergence test (a fixed-round recursion is replayable as unrolled
  * SQL CTEs; d13/x-family discipline), and dangling-node mass leaks
  * (the common simplified variant — redistributing it needs a global
  * per-round rescale that changes no ranking). Every iteration rounds
  * pr to 12 decimals IN BOTH ENGINES, so cross-engine float-summation
  * drift (~1e-16/round) cannot accumulate into the 6-decimal output
  * rounding a gate compares at.
  *
  * Scale shape: outdeg and the degree-annotated edge list are computed
  * once and persisted ([[graft.ManagedCache]]); each iteration is two
  * shuffles — rank ⋈ edges on src, then the contribution groupBy on
  * dst — the standard Pregel-on-relations shape (AQE handles hub skew;
  * a production deployment over a fixed graph would bucket edges by src
  * so the join side never reshuffles). Each round ends in an EAGER
  * localCheckpoint: the round-k plan references round k−1 once per
  * join side, so unbounded lineage would grow linearly in rounds and
  * re-evaluate the whole prefix per action ([[Components]]' discipline;
  * a cluster deployment with executor churn would use reliable
  * checkpointing). One driver action up front (N: the teleport constant
  * needs the node count) — O(1) rows to the driver, never the graph. */
object PageRank {

  /** Ranks after `iters` rounds → (node, pr). `edges` rows are directed
    * src→dst; both endpoint columns are cast to string and deduped.
    * NULL endpoints are dropped. */
  def fixedIter(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1, 50]: $iters (fixed-round contract)")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1): $damping")
    val e0 = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = graft.ManagedCache.swap("PageRank.nodes",
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "PageRank over an empty edge set")
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = graft.ManagedCache.swap("PageRank.edges",
      e0.join(outdeg, "src"))

    // IEEE-portable constants: 1/N and (1−d)/N as the same double ops
    // the oracle writes (CAST(1 AS DOUBLE) − CAST(d AS DOUBLE)) / N
    val init = 1.0 / n
    val teleport = (1.0 - damping) / n

    var pr = nodes.withColumn("pr", lit(init))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) +
            lit(damping) * coalesce(col("m"), lit(0.0)), 12).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
