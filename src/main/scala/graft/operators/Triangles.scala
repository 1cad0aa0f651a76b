package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact per-node TRIANGLE COUNTS over an undirected graph — the
  * local-clustering primitive next to d8's components, x4's PageRank
  * and x11's label propagation: a node's triangle participation is the
  * standard cohesion signal for community strength and spam/bot
  * structure in behavioral graphs.
  *
  * Algorithm: degree-ordered wedge counting (the MapReduce formulation
  * of Suri & Vassilvitskii, WWW'11 — public literature). Every
  * triangle {a,b,c} is counted exactly once, AT ITS LOWEST-ORDER
  * CORNER under the total order (degree, node): edges orient low→high,
  * wedges pivot at the low node, and the closing edge is verified by
  * one semi-join against the canonical edge set. The pivot choice is
  * the scale story: wedge fan-out at a node is C(out-deg, 2), and
  * orienting by degree caps every node's out-degree at O(√m) on any
  * graph (a high-degree hub's edges almost all point INTO it), so the
  * wedge stage is Σ C(out-deg,2) = O(m^1.5) worst-case instead of the
  * Σ C(deg,2) a naive id-ordering pays when a hub holds a small id.
  * All arithmetic is integer; ties in degree break by node id, so the
  * orientation — and therefore every intermediate — is deterministic
  * and replayable in any engine.
  *
  * Shuffles: one groupBy for degrees, two node-keyed joins to attach
  * endpoint degrees, one self-join on the pivot, one semi-join to
  * close, one explode+groupBy for the per-corner rollup — every stage
  * keyed and AQE-sized, nothing all-pairs. */
object Triangles {

  /** (deg, id) tuple comparison — the total order that orients edges. */
  private def ordLt(dA: Column, nA: Column, dB: Column, nB: Column): Column =
    dA < dB || (dA === dB && nA < nB)

  /** Per-node exact triangle counts: (node, n_tri), nodes in at least
    * one triangle. `edges` may contain duplicates, self-loops and both
    * directions — canonicalization dedupes first. */
  def perNodeCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // canon feeds three consumers (degree build, degree attach, the
    // closing probe) and oriented two (both wedge sides) — materialize
    // each once instead of re-running the distinct/joins per consumer
    // (the x4 per-round localCheckpoint discipline)
    val canon = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // attach endpoint degrees, then orient low→high under (deg, id)
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(ordLt(col("da"), col("a"), col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("lo"),
      when(ordLt(col("da"), col("a"), col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("hi"),
      when(ordLt(col("da"), col("a"), col("db"), col("b")), col("db"))
        .otherwise(col("da")).as("hideg"))
      .localCheckpoint(true)
    // wedges pivot at the lowest corner; (deg, id) order between the
    // two high ends keeps each wedge — and so each triangle — unique
    val e1 = oriented.select(col("lo"), col("hi").as("b"),
      col("hideg").as("bdeg"))
    val e2 = oriented.select(col("lo"), col("hi").as("c"),
      col("hideg").as("cdeg"))
    val wedges = e1.join(e2, Seq("lo"))
      .where(ordLt(col("bdeg"), col("b"), col("cdeg"), col("c")))
      .select(col("lo").as("ta"), col("b").as("tb"), col("c").as("tc"))
    // close each wedge against the canonical (id-ordered) edge set
    val closing = canon.select(col("a").as("ca"), col("b").as("cb"))
    val tris = wedges.join(closing,
      least(col("tb"), col("tc")) === col("ca") &&
        greatest(col("tb"), col("tc")) === col("cb"), "left_semi")
    tris.select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
