package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair frames — the transitive-
  * closure step a keep-one-per-CLUSTER dedup needs. [[Dedup.dropNearDups]]
  * is deliberately a one-shot rule and its survivor set is NOT
  * one-per-cluster: on a star (a–c, b–c) it keeps both a and b (only c
  * is ever named doc_b). Production corpus dedup (C4/RefinedWeb-style)
  * instead groups pairs into transitive components and keeps one
  * representative per component. This operator computes (node →
  * component root) for every node mentioned by the pairs.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round
  * is two groupBy-join passes over the edge set, and the edge set
  * converges to a union of stars (node → root) in O(log n) rounds on any
  * graph, O(log d) in practice on near-dup clusters of diameter d. That
  * is the 100 TB shape: no driver-side graph, no per-node iteration (a
  * plain min-label propagation needs O(diameter) rounds and a chain of
  * near-dups makes diameter linear), every pass a key-partitioned
  * aggregate/join AQE can size. Each round persists its edge frame and
  * unpersists the previous one; rounds are independent jobs, so a
  * cluster run can reliably checkpoint every few rounds to truncate
  * lineage (documented, not needed at test scale).
  *
  * Star invariant maintained between rounds: every edge is stored
  * (u, v) with u > v. Large-star symmetrizes internally and emits
  * (bigger-neighbor → component-min) edges; small-star re-points every
  * small neighbor and the center at the center's minimum. Both emit only
  * (x, m) with x > m, so the invariant is free.
  */
object Components {

  private val MaxRounds = 64

  /** (u, v) with u > v, no self-loops, deduped. */
  private def canonical(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** For each node, connect every LARGER neighbor to the minimum of the
    * closed neighborhood. Emits (x, m) with x > u ≥ m, so x > m. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** For each node (edges stored u > v: the group key is the LARGER
    * endpoint), point every smaller neighbor and the node itself at the
    * smallest neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    e.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Component root (minimum member id) for every node appearing in
    * `pairs` → (node, component). Nodes not mentioned by any pair are
    * their own components and are NOT emitted — left-join and coalesce
    * on the caller's side ([[nearDupComponents]]). Ids must be orderable
    * (the root is the component's min under Spark's ordering); both pair
    * columns must share one type.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    // each round MUST truncate lineage, not just cache: largeStar and
    // smallStar both reference their input twice, so the logical plan
    // of round k nests round k-1's plan ~4 times — exponential tree
    // growth that OOMs the DRIVER on plan stringification long before
    // any data pressure. Eager localCheckpoint makes every round's plan
    // a flat scan of materialized blocks (a cluster deployment with
    // executor churn would use reliable checkpointing here — same
    // shape, durable storage); superseded block sets are reclaimed by
    // the ContextCleaner once unreferenced.
    var e = canonical(pairs, aCol, bCol).localCheckpoint(true)
    var eCount = e.count()
    var rounds = 0
    var stable = eCount == 0L
    while (!stable) {
      rounds += 1
      if (rounds > MaxRounds) throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds rounds " +
          "(theoretical bound is O(log n) — this is a bug, not a data property)")
      val e2 = smallStar(largeStar(e)).localCheckpoint(true)
      val e2Count = e2.count()
      // equal-size + one-sided empty difference ⟺ set equality (both
      // deduped) — an exact convergence check, not a fingerprint
      stable = e2Count == eCount &&
        e2.join(e, Seq("u", "v"), "left_anti").isEmpty
      e = e2
      eCount = e2Count
    }
    // at the fixpoint the edge set is a union of stars; the defensive
    // min-agg is a no-op there but makes the contract unconditional
    e.groupBy(col("u")).agg(min("v").as("component"))
      .select(col("u").as("node"), col("component"))
      .union(e.select(col("v"), col("v")).distinct()
        .toDF("node", "component"))
      .groupBy("node").agg(min("component").as("component"))
  }

  /** Every row of `df` with its near-dup `component` (the minimum id of
    * its transitive cluster; rows in no pair are their own component)
    * appended. Keep-one-per-cluster dedup is then
    * `where(col(idCol) === col("component"))` — exactly one survivor per
    * component, unlike [[Dedup.dropNearDups]]'s one-shot rule. */
  def nearDupComponents(df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", idCol)
    df.join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
  }
}
