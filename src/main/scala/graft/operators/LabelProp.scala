package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-iteration synchronous LABEL PROPAGATION (Raghavan et al.
  * 2007) — community detection over an edge list, the clustering
  * sibling of [[PageRank]] (importance) and [[Components]]
  * (connectivity): components says WHO is reachable, LPA says who
  * CLUSTERS — dense neighborhoods agree on a label long before the
  * whole component would.
  *
  * Determinism (the engine's fixed-round discipline): labels start as
  * the node id; each SYNCHRONOUS round every node takes the most
  * frequent label among its in-neighbors, ties broken by the SMALLEST
  * label (the published algorithm breaks ties randomly — that variant
  * is unreplayable across engines by construction); a node with no
  * in-edges keeps its label. A fixed iteration count, no convergence
  * test — the whole trajectory unrolls as SQL CTEs, and oscillation
  * (possible on bipartite graphs under sync updates) is simply part of
  * the replayed trajectory, not a hazard. Integer counts + string
  * min: no float anywhere.
  *
  * Scale shape: per round one rank⋈edges join and one (dst, label)
  * count + per-dst argmax window — the x4 Pregel-on-relations shape
  * with the same per-round eager localCheckpoint (lineage grows
  * linearly in rounds otherwise). Src-bucketed edges are the
  * production layout; AQE absorbs hub skew in the count shuffle. */
object LabelProp {

  /** Labels after `iters` rounds → (node, label). Edge rows are
    * directed src→dst influence (pass each edge both ways for an
    * undirected graph); endpoints cast to string, deduped, NULLs
    * dropped. */
  def fixedIter(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1, 50]: $iters (fixed-round contract)")
    val e0 = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val eCached = graft.ManagedCache.swap("LabelProp.edges", e0)
    val nodes = eCached.select(col("src").as("node"))
      .union(eCached.select(col("dst").as("node"))).distinct()

    var lbl = nodes.withColumn("label", col("node"))
      .localCheckpoint(true)
    val win = Window.partitionBy(col("dst"))
      .orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to iters) {
      val votes = eCached
        .join(lbl.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val winner = votes.withColumn("__rn", row_number().over(win))
        .where(col("__rn") === 1)
        .select(col("dst").as("node"), col("label").as("__new"))
      lbl = lbl.join(winner, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    lbl
  }
}
