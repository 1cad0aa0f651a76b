package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Co-occurrence mining with PMI scoring — the association half of a
  * behavioral-data pipeline ("users who touched A also touched B",
  * item-item similarity for retrieval/recommendation training pairs;
  * Church & Hanks 1990 for PMI, the classic market-basket shape for
  * the join). The reference's events stream stops at windowed counts
  * and sessionization (s1/s2); this is the cross-ITEM statistic those
  * rows feed.
  *
  * Semantics: over the DISTINCT (user, item) incidence — repeat
  * interactions don't inflate association —
  * `pmi(a,b) = ln( c_ab · N / (c_a · c_b) )` where `c_ab` = users
  * touching both, `c_a` = users touching a, N = qualifying users.
  * Pairs are unordered (`item_a < item_b`), thresholded at `minUsers`
  * co-occurrences (PMI on singleton evidence is noise).
  *
  * Scale shape: the pair space is generated per-user (self-join on the
  * user key), so the cost is Σ_u |items_u|² — bounded by
  * `maxItemsPerUser`, the standard power-user/bot guard: users above
  * the cap are DROPPED from N and every count (deterministic,
  * oracle-expressible), because a 10⁶-item crawler would contribute
  * 10¹² pairs of pure noise. With the cap, the join is an equi-join
  * shuffling the capped incidence on the user key; the item count
  * tables are item-cardinality; AQE splits residual skew. Nothing
  * all-pairs across the catalog — only within a user's capped basket.
  * Deterministic integers + one ln → exact oracle under round(…, 6).
  * Output: item_a, item_b, n_co, pmi (unrounded). */
object CoOccur {

  def itemPmi(df: DataFrame, userCol: String, itemCol: String,
      minUsers: Long = 2, maxItemsPerUser: Int = 1000): DataFrame = {
    require(minUsers >= 1, s"minUsers must be >= 1: $minUsers")
    require(maxItemsPerUser >= 2,
      s"maxItemsPerUser must be >= 2 (pairs need two items): $maxItemsPerUser")
    val inc0 = df.select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull)
      .distinct()
    val qualifying = inc0.groupBy("u")
      .agg(count(lit(1)).as("__ni"))
      .where(col("__ni") <= maxItemsPerUser)
      .select("u")
    val inc = inc0.join(qualifying, Seq("u"), "left_semi")
    val n = inc.select(countDistinct(col("u")).cast("long").as("n_users"))
    // incidence is distinct, so per-item user counts are plain counts
    val ci = inc.groupBy("i").agg(count(lit(1)).cast("long").as("c"))
    val pairs = inc.as("a")
      .join(inc.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).cast("long").as("n_co"))
      .where(col("n_co") >= minUsers)
    pairs
      .join(ci.select(col("i").as("item_a"), col("c").as("__ca")), "item_a")
      .join(ci.select(col("i").as("item_b"), col("c").as("__cb")), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_co"),
        // cast each count BEFORE multiplying: c_a·c_b as long·long wraps
        // silently past Long.MaxValue (counts > ~3e9 each) under
        // non-ANSI eval; double·double stays finite and correct
        log(col("n_co").cast("double") * col("n_users") /
          (col("__ca").cast("double") * col("__cb").cast("double")))
          .as("pmi"))
  }
}
